"""Pallas kernel correctness (interpret mode on CPU) vs dense reference."""

import numpy as np
import pytest


def _dense_segmented(q, k, v, seg):
    D = q.shape[-1]
    logits = np.einsum("qhd,khd->hqk", q, k) * (D**-0.5)
    mask = seg[:, None] == seg[None, :]
    logits = np.where(mask[None], logits, -1e30)
    logits = logits - logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,khd->qhd", p, v)


@pytest.mark.parametrize("ranged", [False, True])
def test_segmented_block_attention(ranged):
    import jax.numpy as jnp

    from surya_tpu.ops import flash

    rng = np.random.default_rng(0)
    S, H, D = 1024, 4, 80
    seg = np.full(S, -1, np.int32)
    seg[:320], seg[320:576], seg[576:960] = 0, 1, 2
    q, k, v = (rng.standard_normal((S, H, D), dtype=np.float32) * 0.3 for _ in range(3))

    if ranged:
        BQ, ALIGN = 128, 512
        img_start = np.zeros(S, int)
        img_end = np.zeros(S, int)
        for lo, hi in [(0, 320), (320, 576), (576, 960), (960, S)]:
            img_start[lo:hi], img_end[lo:hi] = lo, hi
        kv_starts = np.zeros(S // BQ, np.int32)
        kv_range = BQ
        for ci in range(S // BQ):
            lo = (img_start[ci * BQ] // ALIGN) * ALIGN
            hi = img_end[min(ci * BQ + BQ, S) - 1]
            kv_starts[ci] = lo
            kv_range = max(kv_range, hi - lo)
        kv_range = int(min(S, -(-kv_range // ALIGN) * ALIGN))
        kv_starts = np.minimum(kv_starts, S - kv_range)
    else:
        kv_starts = np.zeros(S // 128, np.int32)
        kv_range = S

    out = np.asarray(
        flash.segmented_block_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(seg),
            jnp.asarray(kv_starts), kv_range, interpret=True,
        )
    )
    expected = _dense_segmented(q, k, v, seg)
    assert np.abs(out - expected).max() < 1e-5
