"""ADETR decoder trunk — the autoregressive box decoder shared by layout and
table recognition, in JAX.

Re-design of the reference SuryaADETRDecoderModel
(surya/common/adetr/decoder.py:126-651). Per layer: cross-attention over the
vision encoder output (KV computed once per batch), causal self-attention
with RoPE over the box sequence, and a gated-GELU MLP — with the reference's
"double residual flow" option (layout/table configs set it: the self-attn
branch adds the RAW layer input, not the cross-attn output, :420-456).

TPU model: the cross KV and a [layers, B, max_boxes, kvh, hd] self-attn
cache are preallocated; `prefill` runs the query prompt causally and `step`
appends one box per call — both pure functions safe inside lax.while_loop,
so a whole ≤100-step layout decode is ONE device program (the reference
syncs logits to host every box: surya/layout/__init__.py:124-138).

Task-specific embedders and output heads live in the task modules; this file
owns only the trunk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from surya_tpu import nn
from surya_tpu.ops import attention as att


@dataclass(frozen=True)
class ADETRConfig:
    num_hidden_layers: int = 8
    hidden_size: int = 1024
    intermediate_size: int = 4096
    encoder_hidden_size: int = 1024
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    attention_bias: bool = False
    double_residual_flow: bool = True
    cross_attn_layers: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7)
    self_attn_layers: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def init_params(config: ADETRConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    h, hd = config.hidden_size, config.head_dim
    nh, nkv = config.num_attention_heads, config.num_key_value_heads
    bias = config.attention_bias
    layers = []
    for li in range(config.num_hidden_layers):
        layer = {
            "cross_pre_norm": nn.gemma_rmsnorm_init(h, dtype),
            "temporal_pre_norm": nn.gemma_rmsnorm_init(h, dtype),
            "channel_pre_norm": nn.gemma_rmsnorm_init(h, dtype),
            "mlp_block": {
                "gate_proj": nn.linear_init(next(ks), h, config.intermediate_size, bias=False, dtype=dtype),
                "up_proj": nn.linear_init(next(ks), h, config.intermediate_size, bias=False, dtype=dtype),
                "down_proj": nn.linear_init(next(ks), config.intermediate_size, h, bias=False, dtype=dtype),
            },
        }
        if li in config.cross_attn_layers:
            layer["cross_attn_block"] = {
                "q_proj": nn.linear_init(next(ks), h, nh * hd, bias=bias, dtype=dtype),
                "k_proj": nn.linear_init(next(ks), config.encoder_hidden_size, nkv * hd, bias=bias, dtype=dtype),
                "v_proj": nn.linear_init(next(ks), config.encoder_hidden_size, nkv * hd, bias=bias, dtype=dtype),
                "o_proj": nn.linear_init(next(ks), nh * hd, h, bias=True, dtype=dtype),
            }
        if li in config.self_attn_layers:
            layer["temporal_block"] = {
                "q_proj": nn.linear_init(next(ks), h, nh * hd, bias=bias, dtype=dtype),
                "k_proj": nn.linear_init(next(ks), h, nkv * hd, bias=bias, dtype=dtype),
                "v_proj": nn.linear_init(next(ks), h, nkv * hd, bias=bias, dtype=dtype),
                "o_proj": nn.linear_init(next(ks), nh * hd, h, bias=True, dtype=dtype),
            }
        layers.append(layer)
    return {"layers": layers, "final_norm": nn.gemma_rmsnorm_init(h, dtype)}


def init_cache(config: ADETRConfig, batch: int, max_boxes: int, dtype):
    shape = (config.num_hidden_layers, batch, max_boxes, config.num_key_value_heads, config.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(params, config: ADETRConfig, encoder_hidden: jnp.ndarray):
    """One-shot cross-attention KV from the encoder output (the reference
    caches these on first use: decoder.py:196-210)."""
    B, L, _ = encoder_hidden.shape
    ks, vs = [], []
    for layer in params["layers"]:
        blk = layer.get("cross_attn_block")
        if blk is None:
            ks.append(jnp.zeros((B, L, config.num_key_value_heads, config.head_dim), encoder_hidden.dtype))
            vs.append(jnp.zeros((B, L, config.num_key_value_heads, config.head_dim), encoder_hidden.dtype))
            continue
        ks.append(nn.linear(blk["k_proj"], encoder_hidden).reshape(B, L, config.num_key_value_heads, config.head_dim))
        vs.append(nn.linear(blk["v_proj"], encoder_hidden).reshape(B, L, config.num_key_value_heads, config.head_dim))
    return jnp.stack(ks), jnp.stack(vs)


def _rope(config: ADETRConfig, positions):
    freqs = att.rope_freqs(positions.astype(jnp.float32), config.head_dim, config.rope_theta)
    ang = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def _mlp(p, x):
    return nn.linear(p["down_proj"], jax.nn.gelu(nn.linear(p["gate_proj"], x)) * nn.linear(p["up_proj"], x))


def _layer(config, layer, cross_k, cross_v, x, self_attend_fn):
    """One decoder layer. self_attend_fn(normed) -> attention output (handles
    cache). Implements the double-residual flow (reference :420-456)."""
    eps = config.rms_norm_eps
    raw = x

    if "cross_attn_block" in layer:
        blk = layer["cross_attn_block"]
        h = nn.gemma_rmsnorm(layer["cross_pre_norm"], x, eps)
        B, Q, _ = h.shape
        q = nn.linear(blk["q_proj"], h).reshape(B, Q, config.num_attention_heads, config.head_dim)
        out = att.sdpa(q, cross_k, cross_v)
        cross_out = nn.linear(blk["o_proj"], out.reshape(B, Q, -1))
    else:
        cross_out = jnp.zeros_like(x)

    if config.double_residual_flow:
        cross_res = cross_out + raw if "cross_attn_block" in layer else raw
        if "temporal_block" in layer:
            h = nn.gemma_rmsnorm(layer["temporal_pre_norm"], cross_res, eps)
            residual = self_attend_fn(h) + raw
        else:
            residual = cross_res
    else:
        x = cross_out + raw if "cross_attn_block" in layer else raw
        if "temporal_block" in layer:
            h = nn.gemma_rmsnorm(layer["temporal_pre_norm"], x, eps)
            x = self_attend_fn(h) + x
        residual = x

    h = nn.gemma_rmsnorm(layer["channel_pre_norm"], residual, eps)
    return _mlp(layer["mlp_block"], h) + residual


def prefill(params, config: ADETRConfig, cache, cross_k, cross_v, embeds, seq_lens):
    """Causal full-prompt pass writing KV rows [0, L). embeds [B, L, h]
    right-padded; seq_lens [B]. Returns (cache, hidden [B, L, h])."""
    B, L, _ = embeds.shape
    cos, sin = _rope(config, jnp.arange(L)[None, :])
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    causal = att.mask_to_bias(jnp.tril(jnp.ones((L, L), bool)))[None, None]

    x = embeds
    new_k, new_v = cache["k"], cache["v"]
    for li, layer in enumerate(params["layers"]):

        def self_attend(h, li=li, layer=layer):
            nonlocal new_k, new_v
            blk = layer["temporal_block"]
            q = nn.linear(blk["q_proj"], h).reshape(B, L, config.num_attention_heads, config.head_dim)
            k = nn.linear(blk["k_proj"], h).reshape(B, L, config.num_key_value_heads, config.head_dim)
            v = nn.linear(blk["v_proj"], h).reshape(B, L, config.num_key_value_heads, config.head_dim)
            q, k = att.apply_rope(q, k, cos, sin)
            new_k = new_k.at[li, :, :L].set(k)
            new_v = new_v.at[li, :, :L].set(v)
            out = att.sdpa(q, k, v, bias=causal)
            return nn.linear(blk["o_proj"], out.reshape(B, L, -1))

        x = _layer(config, layer, cross_k[li], cross_v[li], x, self_attend)

    x = nn.gemma_rmsnorm(params["final_norm"], x, config.rms_norm_eps)
    cache = {"k": new_k, "v": new_v}
    last = jnp.take_along_axis(x, (seq_lens - 1)[:, None, None], axis=1)
    return cache, last[:, 0]


def step(params, config: ADETRConfig, cache, cross_k, cross_v, embed, pos, write_idx=None, seq_lens=None, prompt_len: int = 0):
    """One AR step. embed [B, h]; pos [B] is the RoPE position. write_idx [B]
    is the KV cache row (defaults to pos) — they differ when the prompt was
    right-padded to a bucket: generated tokens then write at rows
    >= prompt_len while their semantic position continues from seq_len, and
    the garbage rows in [seq_len, prompt_len) are masked via seq_lens.
    Returns (cache, hidden [B, h])."""
    B = embed.shape[0]
    S = cache["k"].shape[2]
    if write_idx is None:
        write_idx = pos
    cos, sin = _rope(config, pos.astype(jnp.float32)[:, None])
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    write_at = jnp.minimum(write_idx, S - 1)
    key_rows = jnp.arange(S)[None, :]
    key_ok = key_rows <= write_at[:, None]
    if seq_lens is not None and prompt_len > 0:
        key_ok &= ~((key_rows >= seq_lens[:, None]) & (key_rows < prompt_len))
    bias = att.mask_to_bias(key_ok[:, None, None, :])
    rows = jnp.arange(B)

    x = embed[:, None, :]
    new_k, new_v = cache["k"], cache["v"]
    for li, layer in enumerate(params["layers"]):

        def self_attend(h, li=li, layer=layer):
            nonlocal new_k, new_v
            blk = layer["temporal_block"]
            q = nn.linear(blk["q_proj"], h).reshape(B, 1, config.num_attention_heads, config.head_dim)
            k = nn.linear(blk["k_proj"], h).reshape(B, 1, config.num_key_value_heads, config.head_dim)
            v = nn.linear(blk["v_proj"], h).reshape(B, 1, config.num_key_value_heads, config.head_dim)
            q, k = att.apply_rope(q, k, cos, sin)
            new_k = new_k.at[li, rows, write_at].set(k[:, 0])
            new_v = new_v.at[li, rows, write_at].set(v[:, 0])
            out = att.sdpa(q, new_k[li], new_v[li], bias=bias)
            return nn.linear(blk["o_proj"], out.reshape(B, 1, -1))

        x = _layer(config, layer, cross_k[li], cross_v[li], x, self_attend)

    x = nn.gemma_rmsnorm(params["final_norm"], x, config.rms_norm_eps)
    return {"k": new_k, "v": new_v}, x[:, 0]


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(bag, config: ADETRConfig, prefix: str):
    pre = f"{prefix}." if prefix else ""
    layers = []
    for li in range(config.num_hidden_layers):
        b = f"{pre}layers.{li}"
        layer = {
            "cross_pre_norm": {"scale": bag.raw(f"{b}.cross_pre_norm.weight")},
            "temporal_pre_norm": {"scale": bag.raw(f"{b}.temporal_pre_norm.weight")},
            "channel_pre_norm": {"scale": bag.raw(f"{b}.channel_pre_norm.weight")},
            "mlp_block": {
                "gate_proj": bag.linear(f"{b}.mlp_block.gate_proj", bias=False),
                "up_proj": bag.linear(f"{b}.mlp_block.up_proj", bias=False),
                "down_proj": bag.linear(f"{b}.mlp_block.down_proj", bias=False),
            },
        }
        if li in config.cross_attn_layers:
            layer["cross_attn_block"] = {
                "q_proj": bag.linear(f"{b}.cross_attn_block.q_proj"),
                "k_proj": bag.linear(f"{b}.cross_attn_block.k_proj"),
                "v_proj": bag.linear(f"{b}.cross_attn_block.v_proj"),
                "o_proj": bag.linear(f"{b}.cross_attn_block.o_proj"),
            }
        if li in config.self_attn_layers:
            layer["temporal_block"] = {
                "q_proj": bag.linear(f"{b}.temporal_block.q_proj"),
                "k_proj": bag.linear(f"{b}.temporal_block.k_proj"),
                "v_proj": bag.linear(f"{b}.temporal_block.v_proj"),
                "o_proj": bag.linear(f"{b}.temporal_block.o_proj"),
            }
        layers.append(layer)
    return {"layers": layers, "final_norm": {"scale": bag.raw(f"{pre}final_norm.weight")}}
