"""Attention primitives.

All attention in surya_tpu flows through the helpers here so the jnp reference
implementations (used on CPU and for numeric validation) and the Pallas TPU
kernels (surya_tpu.ops.flash) stay interchangeable. Softmax always runs in
fp32 (matches the reference torch models: e.g. surya/common/surya/decoder/
__init__.py:119-121, encoder :253-257).

Layout convention: q/k/v are [B, S, H, Dh] ("BSHD"); masks are additive fp32
biases broadcastable to [B, H, Sq, Skv].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask (True = attend) → additive bias."""
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense scaled-dot-product attention, fp32 softmax. q,k,v: [B, S, H, D].
    GQA (more q heads than kv heads) is computed grouped — kv is NEVER
    materialized per-q-head (a q-head-major repeat costs ~GBs of HBM traffic
    per decode step at large caches)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    B, Sq, H, D = q.shape
    n_kv = k.shape[2]
    n_rep = H // n_kv

    if n_rep == 1:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    # grouped: q head h uses kv head h // n_rep (matches torch repeat_kv)
    qg = q.reshape(B, Sq, n_kv, n_rep, D)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k).astype(jnp.float32) * scale
    if bias is not None:
        # bias comes in [..., H(broadcast or 1), Sq, Sk]; group the head axis
        if bias.ndim == 4 and bias.shape[1] == H:
            bias = bias.reshape(bias.shape[0], n_kv, n_rep, *bias.shape[2:])
        else:
            bias = bias[:, :, None] if bias.ndim == 4 else bias
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(B, Sq, H, D)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """Rotary embedding, fp32 rotation (reference casts to float before the
    rotation in both encoder and decoder). cos/sin broadcast to q/k shape
    [B, S, H, D] with cos/sin [B, S, 1, D] or [S, 1, D]."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def rope_freqs(positions: jnp.ndarray, head_dim: int, theta: float) -> jnp.ndarray:
    """1-D RoPE angle table: positions [...,] → freqs [..., head_dim//2]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    return positions.astype(jnp.float32)[..., None] * inv_freq
