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
    """Dense scaled-dot-product attention, fp32 softmax. q,k,v: [B, S, H, D]
    (H may differ between q and kv for GQA — kv heads are repeated)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    n_rep = q.shape[2] // k.shape[2]
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


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
