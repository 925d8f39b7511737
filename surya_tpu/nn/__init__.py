"""Minimal functional NN substrate.

Every model in surya_tpu is a pure function over a parameter pytree (nested
dicts of jnp arrays). This module provides init/apply pairs for the handful of
primitive layers the model zoo needs. Conventions:

  - images are NHWC (TPU-native layout); conv kernels are HWIO
  - matmul-heavy ops run in the param dtype (bf16 on TPU) with fp32 islands
    where the reference keeps fp32 (softmax, norms) so numerics match
  - batch-norm is inference-only and pre-folded into a per-channel
    scale/bias at parameter-build time (XLA fuses it into the conv)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, std: float = 0.02, dtype=jnp.float32):
    kw, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(kw, (in_dim, out_dim), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p, x):
    if "kernel_q" in p:
        # weight-only int8: HBM reads are the int8 bytes (XLA fuses the
        # convert into the dot's operand read); per-output-channel scales
        # commute with the contraction so they apply to the small output
        y = x @ p["kernel_q"].astype(x.dtype)
        y = y * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_linear(p):
    """Symmetric per-output-channel int8 quantization of a linear's kernel.
    Halves (vs bf16) or quarters (vs f32) the weight bytes each matmul
    streams from HBM — the dominant cost of small-batch decode steps."""
    if "kernel_q" in p or "kernel" not in p:
        return p
    # quantize in float32: a bf16 checkpoint's ratio near +-127 sits on a
    # 0.5-spaced grid and would misassign the largest-magnitude levels
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    q = jnp.round(w / jnp.maximum(scale, 1e-8)[None, :]).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale.astype(jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def embedding_init(key, num: int, dim: int, std: float = 0.02, dtype=jnp.float32):
    return {"embedding": jax.random.normal(key, (num, dim), dtype) * std}


def embedding(p, ids):
    return jnp.take(p["embedding"], ids, axis=0)


def layernorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(p, x, eps: float = 1e-6):
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dt)


def rmsnorm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def gemma_rmsnorm_init(dim: int, dtype=jnp.float32):
    # Gemma convention: weight stored as zeros, applied as (1 + w)
    return {"scale": jnp.zeros((dim,), dtype)}


def gemma_rmsnorm(p, x, eps: float = 1e-6):
    """ADETR RMSNorm (reference surya/common/adetr/decoder.py:23-50):
    variance clamped to eps, (1 + w) scaling, output clamped to the input
    dtype's range with NaNs zeroed."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=-1, keepdims=True), eps)
    y = xf * jax.lax.rsqrt(var)
    y = y * (1.0 + p["scale"].astype(jnp.float32))
    info = jnp.finfo(dt)
    y = jnp.clip(y, float(info.min), float(info.max))
    y = jnp.where(jnp.isnan(y), 0.0, y)
    return y.astype(dt)


def rmsnorm(p, x, eps: float = 1e-6):
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(dt)


def conv2d_init(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int | Tuple[int, int],
    bias: bool = True,
    groups: int = 1,
    std: float = 0.02,
    dtype=jnp.float32,
):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    p = {
        "kernel": jax.random.normal(key, (*kernel_size, in_ch // groups, out_ch), dtype) * std
    }
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


def conv2d(
    p,
    x,
    stride: int | Tuple[int, int] = 1,
    padding="SAME",
    groups: int = 1,
    dilation: int | Tuple[int, int] = 1,
):
    """NHWC conv with HWIO kernel. `padding` may be 'SAME', 'VALID', an int, or
    explicit [(lo, hi), (lo, hi)] pairs."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def torch_conv_padding(kernel_size: int, stride: int = 1, dilation: int = 1):
    """Explicit padding matching torch Conv2d(padding=((s-1)+d*(k-1))//2) so
    feature-map sizes agree with the reference for even strides."""
    pad = ((stride - 1) + dilation * (kernel_size - 1)) // 2
    return [(pad, pad), (pad, pad)]


def bn_fold_init(ch: int, dtype=jnp.float32):
    """Inference batch-norm folded to scale/bias (identity at init)."""
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def bn_fold(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def fold_batchnorm(weight, bias, running_mean, running_var, eps: float = 1e-5):
    """Collapse torch BatchNorm2d stats into an affine scale/bias pair."""
    scale = weight / jnp.sqrt(running_var + eps)
    return {"scale": scale, "bias": bias - running_mean * scale}


# Activations --------------------------------------------------------------

def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


ACTIVATIONS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "relu6": relu6,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "hardswish": hardswish,
}


def bilinear_resize(x, out_hw: Tuple[int, int]):
    """NHWC bilinear resize with align_corners=False (torch F.interpolate
    parity); used by the detection decode head and heatmap upsampling."""
    return jax.image.resize(x, (x.shape[0], *out_hw, x.shape[-1]), method="bilinear")


def key_iter(key):
    """Infinite stream of fresh PRNG keys for parameter init."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
