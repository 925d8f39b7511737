"""DonutSwin encoder (layout + table-rec vision backbone), in JAX.

Re-design of the reference encoder (surya/common/donut/encoder.py:84-957) for
static TPU shapes: inputs are always the processor's fixed 768x768, so every
window partition/shift/merge is a constant-shape reshape/roll and the shifted
-window attention masks are compile-time constants. Matches the reference
numerically: GQA-capable window attention with relative-position bias tables,
per-stage 2-D sincos positional encoding (including its transposed w-major
ordering quirk, :728-753), patch merging, and the final learned positional
embedding added by the task models (layout/model/encoder.py:17-80,
table_rec/model/encoder.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu import nn


@dataclass(frozen=True)
class DonutSwinConfig:
    image_size: Tuple[int, int] = (768, 768)
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 16, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    num_kv_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    encoder_length: int = 768
    use_positional_embeddings: bool = True

    @property
    def hidden_size(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.patch_size, self.image_size[1] // self.patch_size)


# -- static tables -----------------------------------------------------------

def _relative_position_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # [win*win, win*win]


def _shift_mask(height: int, width: int, window: int, shift: int) -> np.ndarray:
    """Additive mask for shifted-window attention (reference get_attn_mask
    :566-592): tokens from different pre-shift regions get -100."""
    img = np.zeros((height, width))
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    win = img.reshape(height // window, window, width // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)  # [nW, ws*ws, ws*ws]


def _sincos_2d(height: int, width: int, dim: int) -> np.ndarray:
    """Reference build_2d_sincos_position_embedding (:728-753): note out_w/h
    iterate w-major (meshgrid 'ij' over (width, height)), a transposition quirk
    kept for weight compatibility."""
    grid_w, grid_h = np.meshgrid(np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32), indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (10000.0 ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.flatten()[:, None] * omega[None]
    out_h = grid_h.flatten()[:, None] * omega[None]
    return np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1)


# -- params ------------------------------------------------------------------

def init_params(config: DonutSwinConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    params = {
        "patch_embed": nn.conv2d_init(next(ks), config.num_channels, config.embed_dim, config.patch_size, dtype=dtype),
        "embed_norm": nn.layernorm_init(config.embed_dim, dtype),
        "stages": [],
        "position_embeddings": jnp.zeros((config.encoder_length, config.hidden_size), dtype),
    }
    for i, depth in enumerate(config.depths):
        dim = int(config.embed_dim * 2**i)
        win2 = config.window_size**2
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": nn.layernorm_init(dim, dtype),
                    "norm2": nn.layernorm_init(dim, dtype),
                    "attn": {
                        "query": nn.linear_init(next(ks), dim, dim, dtype=dtype),
                        "key": nn.linear_init(next(ks), dim, dim * config.num_kv_heads[i] // config.num_heads[i], dtype=dtype),
                        "value": nn.linear_init(next(ks), dim, dim * config.num_kv_heads[i] // config.num_heads[i], dtype=dtype),
                        "proj": nn.linear_init(next(ks), dim, dim, dtype=dtype),
                        "rel_bias": jnp.zeros(((2 * config.window_size - 1) ** 2, config.num_heads[i]), dtype),
                    },
                    "mlp": {
                        "fc1": nn.linear_init(next(ks), dim, int(dim * config.mlp_ratio), dtype=dtype),
                        "fc2": nn.linear_init(next(ks), int(dim * config.mlp_ratio), dim, dtype=dtype),
                    },
                }
            )
        stage = {"blocks": blocks}
        if i < len(config.depths) - 1:
            stage["downsample"] = {
                "norm": nn.layernorm_init(4 * dim, dtype),
                "reduction": nn.linear_init(next(ks), 4 * dim, 2 * dim, bias=False, dtype=dtype),
            }
        params["stages"].append(stage)
    return params


# -- forward -----------------------------------------------------------------

def _window_partition(x, window):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(x, window, H, W, B):
    x = x.reshape(B, H // window, W // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _swin_attention(p, x, n_heads, n_kv_heads, bias):
    """x: [nWin_total, win2, C]; bias: [.., heads, win2, win2] additive."""
    NW, L, C = x.shape
    head_dim = C // n_heads
    q = nn.linear(p["query"], x).reshape(NW, L, n_heads, head_dim)
    k = nn.linear(p["key"], x).reshape(NW, L, n_kv_heads, head_dim)
    v = nn.linear(p["value"], x).reshape(NW, L, n_kv_heads, head_dim)
    if n_kv_heads != n_heads:
        # reference repeats kv along the head axis via tensor.repeat — i.e.
        # tiling, not interleaving (encoder.py:379-385)
        rep = n_heads // n_kv_heads
        k = jnp.tile(k, (1, 1, rep, 1))
        v = jnp.tile(v, (1, 1, rep, 1))
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k).astype(jnp.float32) * (head_dim**-0.5)
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(NW, L, C)
    return nn.linear(p["proj"], out)


def apply(params, config: DonutSwinConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values: [B, H, W, 3] normalized. Returns [B, tokens, hidden] with
    the learned positional embedding added."""
    eps = config.layer_norm_eps
    win = config.window_size
    B = pixel_values.shape[0]

    x = nn.conv2d(params["patch_embed"], pixel_values, stride=config.patch_size, padding="VALID")
    H, W = x.shape[1:3]
    x = nn.layernorm(params["embed_norm"], x.reshape(B, H * W, -1), eps=eps)

    rel_idx = _relative_position_index(win)

    for i, stage in enumerate(params["stages"]):
        dim = int(config.embed_dim * 2**i)
        h, w = config.grid[0] // 2**i, config.grid[1] // 2**i
        if config.use_positional_embeddings:
            x = x + jnp.asarray(_sincos_2d(h, w, dim), x.dtype)[None]

        shift_bias = jnp.asarray(_shift_mask(h, w, win, win // 2))  # [nW, w2, w2]
        n_heads, n_kv = config.num_heads[i], config.num_kv_heads[i]

        for bi, block in enumerate(stage["blocks"]):
            shift = 0 if bi % 2 == 0 else win // 2
            shortcut = x
            hx = nn.layernorm(block["norm1"], x, eps=eps).reshape(B, h, w, dim)
            if shift:
                hx = jnp.roll(hx, (-shift, -shift), axis=(1, 2))
            windows = _window_partition(hx, win)

            rel_bias = jnp.take(block["attn"]["rel_bias"], rel_idx.reshape(-1), axis=0)
            rel_bias = rel_bias.reshape(win * win, win * win, -1).transpose(2, 0, 1).astype(jnp.float32)
            bias = rel_bias[None]  # [1, heads, w2, w2]
            if shift:
                nW = (h // win) * (w // win)
                bias = bias + jnp.tile(shift_bias[:, None], (B, 1, 1, 1)).reshape(B * nW, 1, win * win, win * win)

            attn = _swin_attention(block["attn"], windows, n_heads, n_kv, bias)
            attn = _window_reverse(attn, win, h, w, B)
            if shift:
                attn = jnp.roll(attn, (shift, shift), axis=(1, 2))
            x = shortcut + attn.reshape(B, h * w, dim)

            hx = nn.layernorm(block["norm2"], x, eps=eps)
            hx = nn.linear(block["mlp"]["fc2"], jax.nn.gelu(nn.linear(block["mlp"]["fc1"], hx), approximate=False))
            x = x + hx

        if "downsample" in stage:
            xs = x.reshape(B, h, w, dim)
            merged = jnp.concatenate(
                [xs[:, 0::2, 0::2], xs[:, 1::2, 0::2], xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]], axis=-1
            ).reshape(B, (h // 2) * (w // 2), 4 * dim)
            merged = nn.layernorm(stage["downsample"]["norm"], merged, eps=eps)
            x = nn.linear(stage["downsample"]["reduction"], merged)

    x = x + params["position_embeddings"][None, : x.shape[1], :].astype(x.dtype)
    return x


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(bag, config: DonutSwinConfig, prefix: str = "encoder"):
    pre = f"{prefix}." if prefix else ""
    params = {
        "patch_embed": bag.conv(f"{pre}embeddings.patch_embeddings.projection"),
        "embed_norm": bag.layernorm(f"{pre}embeddings.norm"),
        "position_embeddings": bag.raw(f"{pre}position_embeddings")[0],
        "stages": [],
    }
    for i, depth in enumerate(config.depths):
        blocks = []
        for b in range(depth):
            base = f"{pre}encoder.layers.{i}.blocks.{b}"
            blocks.append(
                {
                    "norm1": bag.layernorm(f"{base}.layernorm_before"),
                    "norm2": bag.layernorm(f"{base}.layernorm_after"),
                    "attn": {
                        "query": bag.linear(f"{base}.attention.self.query"),
                        "key": bag.linear(f"{base}.attention.self.key"),
                        "value": bag.linear(f"{base}.attention.self.value"),
                        "proj": bag.linear(f"{base}.attention.output.dense"),
                        "rel_bias": bag.raw(f"{base}.attention.self.relative_position_bias_table"),
                    },
                    "mlp": {
                        "fc1": bag.linear(f"{base}.intermediate.dense"),
                        "fc2": bag.linear(f"{base}.output.dense"),
                    },
                }
            )
        stage = {"blocks": blocks}
        if i < len(config.depths) - 1:
            stage["downsample"] = {
                "norm": bag.layernorm(f"{pre}encoder.layers.{i}.downsample.norm"),
                "reduction": bag.linear(f"{pre}encoder.layers.{i}.downsample.reduction", bias=False),
            }
        params["stages"].append(stage)
    # the relative_position_index buffers are recomputed, not loaded
    for i, depth in enumerate(config.depths):
        for b in range(depth):
            bag.used.add(f"{pre}encoder.layers.{i}.blocks.{b}.attention.self.relative_position_index")
    return params
