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


@pytest.mark.parametrize("L,gqa", [(256, True), (320, False)])
def test_causal_flash_attention(L, gqa):
    """Causal prefill kernel (interpret) vs the dense sdpa path, incl. GQA
    and a length that 128 doesn't divide (320 -> block_q shrinks to 64)."""
    import jax.numpy as jnp

    from surya_tpu.ops import attention as att
    from surya_tpu.ops import flash

    rng = np.random.default_rng(1)
    B, H, D = 2, 4, 64
    kvh = 2 if gqa else H
    q = rng.standard_normal((B, L, H, D), dtype=np.float32) * 0.3
    k = rng.standard_normal((B, L, kvh, D), dtype=np.float32) * 0.3
    v = rng.standard_normal((B, L, kvh, D), dtype=np.float32) * 0.3

    out = np.asarray(
        flash.causal_flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    )
    causal = att.mask_to_bias(jnp.tril(jnp.ones((L, L), bool)))[None, None]
    expected = np.asarray(att.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias=causal))
    assert np.abs(out - expected).max() < 1e-5


def test_prefill_pallas_matches_dense():
    """qwen_decoder.prefill with the flash kernel (interpret via monkeypatch)
    matches the dense path on a tiny config."""
    import jax.numpy as jnp

    from surya_tpu.models import qwen_decoder
    from surya_tpu.ops import flash

    cfg = qwen_decoder.DecoderConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    import jax

    params = qwen_decoder.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.standard_normal((2, 128, 64), dtype=np.float32) * 0.1)
    seq_lens = jnp.asarray([100, 128], jnp.int32)

    k_dense, v_dense, h_dense = qwen_decoder.prefill(params, cfg, embeds, seq_lens, use_pallas=False)

    orig = flash.causal_flash_attention
    import functools

    flash.causal_flash_attention = functools.partial(orig, interpret=True)
    try:
        k_fl, v_fl, h_fl = qwen_decoder.prefill(params, cfg, embeds, seq_lens, use_pallas=True)
    finally:
        flash.causal_flash_attention = orig

    assert np.abs(np.asarray(h_fl) - np.asarray(h_dense)).max() < 1e-4
    assert np.abs(np.asarray(k_fl) - np.asarray(k_dense)).max() < 1e-5
