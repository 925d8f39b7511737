"""chunk_stop_scan must match the per-token reference semantics exactly:
appending one token at a time and checking EOS/pad, the token budget, and
detect_repeat_token after each append (reference
surya/recognition/__init__.py:583-595)."""

import numpy as np

from surya_tpu.recognition.util import chunk_stop_scan, detect_repeat_token

EOS, PAD = 1, 0


def reference_scan(history, chunk, budget, eos=EOS, pad=PAD, max_repeats=40):
    toks = list(history)
    for j, t in enumerate(chunk):
        toks.append(int(t))
        if (
            t in (eos, pad)
            or len(toks) >= budget
            or detect_repeat_token(toks, max_repeats)
        ):
            return True, j
    return False, len(chunk) - 1


def run_case(histories, chunks, budgets, max_repeats=40):
    A = len(chunks)
    K = len(chunks[0])
    ctoks = np.asarray(chunks, np.int32).reshape(A, K)
    prior = np.array([len(h) for h in histories])
    budget = np.asarray(budgets)
    tails = np.full((A, max_repeats - 1), -1, np.int32)
    for i, h in enumerate(histories):
        t = h[-(max_repeats - 1):]
        if t:
            tails[i, -len(t):] = t
    any_stop, cut = chunk_stop_scan(ctoks, prior, budget, tails, EOS, PAD, max_repeats)
    for i in range(A):
        want_stop, want_cut = reference_scan(histories[i], chunks[i], budgets[i], max_repeats=max_repeats)
        assert bool(any_stop[i]) == want_stop, f"row {i}: stop {any_stop[i]} != {want_stop}"
        assert int(cut[i]) == want_cut, f"row {i}: cut {cut[i]} != {want_cut}"


def test_eos_pad_and_budget():
    run_case(
        histories=[[], [5] * 10, [7] * 100, []],
        chunks=[
            [9, 9, EOS, 9, 9, 9, 9, 9],
            [9, PAD, 9, 9, 9, 9, 9, 9],
            [9, 8, 7, 6, 5, 4, 3, 2],  # budget hits mid-chunk
            [9, 8, 7, 6, 5, 4, 3, 2],  # nothing stops
        ],
        budgets=[100, 100, 104, 100],
    )


def test_repeat_cycles():
    # cycle lengths 1..5 triggering mid-chunk, plus a >5-unique non-trigger
    cases, budgets, hists = [], [], []
    for u in range(1, 6):
        cyc = list(range(100, 100 + u))
        hists.append(cyc * 20)  # already repeating
        cases.append(cyc * 4)
        budgets.append(10_000)
    hists.append(list(range(200, 260)))
    cases.append(list(range(300, 300 + 20)))
    budgets.append(10_000)
    K = max(len(c) for c in cases)
    cases = [c + [42 + i for i in range(K - len(c))] for c in cases]
    run_case(hists, cases, budgets)


def test_repeat_starts_inside_chunk():
    # history diverse; the cycle only completes within the chunk
    hist = list(range(400, 430))
    chunk = [500, 501] * 16
    run_case([hist], [chunk], [10_000])


def test_short_history_never_repeats():
    # total length < max_repeats: repeat detector must not fire even though
    # the sentinel padding makes windows look cyclic
    run_case([[]], [[PAD + 2] * 16], [10_000])
    run_case([[3] * 10], [[3] * 16], [10_000])


def test_randomized_against_reference():
    rng = np.random.default_rng(0)
    for _ in range(50):
        A = int(rng.integers(1, 6))
        K = int(rng.integers(1, 33))
        hists, chunks, budgets = [], [], []
        for _ in range(A):
            hl = int(rng.integers(0, 80))
            # small vocab => frequent accidental cycles
            hists.append(rng.integers(2, 8, hl).tolist())
            chunks.append(rng.integers(0, 8, K).tolist())
            budgets.append(int(rng.integers(1, 120)))
        run_case(hists, chunks, budgets)


def test_interleave_shard_slots():
    from surya_tpu.recognition.util import interleave_shard_slots

    # 8 slots in 4 shard blocks of 2: round-robin takes one per shard first
    assert interleave_shard_slots(list(range(8)), 2) == [0, 2, 4, 6, 1, 3, 5, 7]
    # partial free list keeps the per-shard spread
    assert interleave_shard_slots([0, 1, 2, 5, 7], 2) == [0, 2, 1, 5, 7]
    # no sharding -> unchanged
    assert interleave_shard_slots([3, 1, 2], 0) == [3, 1, 2]


def test_device_repeat_stop_matches_host_cut():
    """decode_chunk's device run-length stop (uniq=1 collapse) must cut at
    exactly the step the host chunk_stop_scan keeps last, and pad everything
    after it — so enabling it cannot change host-visible output."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    W = 10  # smallest window the host scan supports (period checks up to 5)
    enc = qwen_encoder.EncoderConfig(
        depth=1, hidden_size=64, intermediate_size=128, num_heads=4,
        window_size=56, out_hidden_size=64, fullatt_block_indexes=(),
    )
    dec = qwen_decoder.DecoderConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = foundation.FoundationConfig(vocab_size=64, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(3))

    B, K = 4, 24
    tok0 = jnp.asarray(np.array([5, 9, 17, 33], np.int32))
    active = jnp.ones((B,), bool)

    def fresh_cache():
        cache = qwen_decoder.init_cache(dec, B, 64, jnp.float32)
        ids = jnp.tile(jnp.asarray(np.array([[3, 4, 5]], np.int32)), (B, 1))
        seq_lens = jnp.full((B,), 3, jnp.int32)
        embeds = foundation.embed_prompt_tokens(
            params, cfg, ids, jnp.full((B, 3), -1, jnp.int32), jnp.zeros((1, 64))
        )
        nk, nv, _ = qwen_decoder.prefill(params["decoder"], dec, embeds, seq_lens)
        return qwen_decoder.merge_prefill(cache, nk, nv, seq_lens, jnp.arange(B))

    _, base_toks, base_scores, *_ = foundation.decode_chunk(
        params, cfg, fresh_cache(), tok0, active, num_steps=K
    )
    _, rep_toks, rep_scores, _, _, rep_active, run_out = foundation.decode_chunk(
        params, cfg, fresh_cache(), tok0, active, num_steps=K,
        run=jnp.ones((B,), jnp.int32), repeat_window=W,
    )
    base_toks, rep_toks = np.asarray(base_toks), np.asarray(rep_toks)

    # host oracle over the unrestricted token stream: prior=1 (the seed
    # token), tails = [-1..., tok0], huge budget -> only repeat stops fire
    tails = np.full((B, W - 1), -1, np.int32)
    tails[:, -1] = np.asarray(tok0)
    any_stop, cut = chunk_stop_scan(
        base_toks, np.ones(B, int), np.full(B, 10_000), tails,
        cfg.eos_token_id, cfg.pad_token_id, W
    )
    # non-vacuity: untrained greedy must collapse somewhere in the batch
    assert any_stop.any()
    for i in range(B):
        if not any_stop[i]:
            np.testing.assert_array_equal(rep_toks[i], base_toks[i])
            continue
        k = int(cut[i])
        np.testing.assert_array_equal(rep_toks[i, : k + 1], base_toks[i, : k + 1])
        # uniq=1 stops (run of W equal tokens) must be padded on device from
        # the very next step; period-2..5 stops may keep decoding (the host
        # kill handles those) but never diverge before the cut
        window = np.concatenate([tails[i], base_toks[i, : k + 1]])[-W:]
        if len(set(window.tolist())) == 1:
            assert not bool(np.asarray(rep_active)[i])
            assert (rep_toks[i, k + 1 :] == cfg.pad_token_id).all()
            assert (np.asarray(rep_scores)[i, k + 1 :] == 0).all()
