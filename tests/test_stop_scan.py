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
