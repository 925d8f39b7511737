"""Qwen2-style autoregressive decoder (recognition), in JAX.

TPU-native re-design of the reference decoder
(surya/common/surya/decoder/__init__.py:137-490). Differences from the torch
version, all driven by XLA's static-shape model:

  - the KV cache is a preallocated slot array [layers, slots, kvh, max_seq, hd]
    with a per-slot length counter. Sequences are LEFT-ALIGNED (position 0 at
    cache row 0) instead of the reference's left-padding + merge/trim dance
    (surya/recognition/cache.py:39-105): prefill writes rows [0, len), decode
    appends at cache_len, attention masks rows >= cache_len. Nothing is ever
    re-packed, so shapes never change. Rows are stored HEAD-MAJOR
    ([kvh, max_seq, hd]) so the decode kernel's per-(slot, head) cache blocks
    are single contiguous DMAs.
  - prefill uses right padding + a pure causal mask (valid tokens only attend
    valid predecessors by construction), and the last-token hidden state is
    gathered at seq_len-1 per row.
  - GQA (repeated kv heads), QKV bias, RoPE, RMSNorm and SwiGLU match the
    reference numerically (fp32 softmax/norm islands).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from surya_tpu import nn
from surya_tpu.ops import attention as att


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 65536
    hidden_size: int = 1536
    intermediate_size: int = 4096
    num_hidden_layers: int = 10
    num_attention_heads: int = 12
    num_key_value_heads: int = 4
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def init_params(config: DecoderConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    h, hd = config.hidden_size, config.head_dim
    nh, nkv = config.num_attention_heads, config.num_key_value_heads
    layers = []
    for _ in range(config.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": nn.rmsnorm_init(h, dtype),
                "post_attention_layernorm": nn.rmsnorm_init(h, dtype),
                "self_attn": {
                    "q_proj": nn.linear_init(next(ks), h, nh * hd, dtype=dtype),
                    "k_proj": nn.linear_init(next(ks), h, nkv * hd, dtype=dtype),
                    "v_proj": nn.linear_init(next(ks), h, nkv * hd, dtype=dtype),
                    "o_proj": nn.linear_init(next(ks), nh * hd, h, bias=False, dtype=dtype),
                },
                "mlp": {
                    "gate_proj": nn.linear_init(next(ks), h, config.intermediate_size, bias=False, dtype=dtype),
                    "up_proj": nn.linear_init(next(ks), h, config.intermediate_size, bias=False, dtype=dtype),
                    "down_proj": nn.linear_init(next(ks), config.intermediate_size, h, bias=False, dtype=dtype),
                },
            }
        )
    return {"layers": layers, "norm": nn.rmsnorm_init(h, dtype)}


def init_cache(config: DecoderConfig, n_slots: int, max_seq: int, dtype, quantize: bool = False):
    """Slot KV cache [layers, slots, kvh, max_seq, hd]; quantize=True stores
    int8 values with per-(slot, head, row) scales — half the HBM
    footprint/bandwidth of bf16 (the TPU counterpart of the reference's HQQ
    quantized cache, surya/recognition/cache.py:112-186)."""
    shape = (config.num_hidden_layers, n_slots, config.num_key_value_heads, max_seq, config.head_dim)
    cache = {"len": jnp.zeros((n_slots,), jnp.int32)}
    if quantize:
        cache["k"] = jnp.zeros(shape, jnp.int8)
        cache["v"] = jnp.zeros(shape, jnp.int8)
        cache["k_scale"] = jnp.zeros(shape[:-1], jnp.bfloat16)
        cache["v_scale"] = jnp.zeros(shape[:-1], jnp.bfloat16)
    else:
        cache["k"] = jnp.zeros(shape, dtype)
        cache["v"] = jnp.zeros(shape, dtype)
    return cache


def quantize_kv(x):
    """Symmetric per-vector int8: x [..., head_dim] → (int8 values, scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def dequantize_kv(q, scale, dtype):
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]).astype(dtype)


def _rope_cos_sin(config: DecoderConfig, positions: jnp.ndarray):
    """positions [..., S] → cos/sin [..., S, head_dim]."""
    freqs = att.rope_freqs(positions, config.head_dim, config.rope_theta)
    ang = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def quantize_weights(params: dict) -> dict:
    """Weight-only int8 for every decoder projection (RECOGNITION_WEIGHT_
    QUANTIZE). Decode re-reads the full decoder weight set from HBM on every
    one of the K on-device steps per chunk, so weight bytes — not FLOPs —
    bound small-batch decode; int8 halves them vs bf16. Activations stay in
    compute dtype (per-output-channel scales fold into the matmul output)."""
    for layer in params["layers"]:
        sa, mlp = layer["self_attn"], layer["mlp"]
        for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sa[k] = nn.quantize_linear(sa[k])
        for k in ("gate_proj", "up_proj", "down_proj"):
            mlp[k] = nn.quantize_linear(mlp[k])
    return params


def _proj_qkv(p, x, config: DecoderConfig):
    B, S, _ = x.shape
    q = nn.linear(p["q_proj"], x).reshape(B, S, config.num_attention_heads, config.head_dim)
    k = nn.linear(p["k_proj"], x).reshape(B, S, config.num_key_value_heads, config.head_dim)
    v = nn.linear(p["v_proj"], x).reshape(B, S, config.num_key_value_heads, config.head_dim)
    return q, k, v


def _mlp(p, x):
    return nn.linear(p["down_proj"], jax.nn.silu(nn.linear(p["gate_proj"], x)) * nn.linear(p["up_proj"], x))


def prefill(params, config: DecoderConfig, embeds: jnp.ndarray, seq_lens: jnp.ndarray, use_pallas=None, mesh=None):
    """Full-sequence causal forward (right-padded).

    embeds: [B, L, hidden]; seq_lens: [B] valid lengths.
    use_pallas: None = auto (settings); False forces the dense jnp path.
    mesh: shard_map the flash kernel over this mesh (multi-chip).
    Returns (new_k [layers, B, L, kvh, hd], new_v, last_hidden [B, hidden]).
    """
    if use_pallas is None:
        from surya_tpu.settings import settings

        use_pallas = settings.USE_PALLAS_ATTENTION and settings.DEVICE != "cpu"

    B, L, _ = embeds.shape
    positions = jnp.arange(L)
    cos, sin = _rope_cos_sin(config, positions)
    cos, sin = cos[None, :, None, :], sin[None, :, None, :]
    if use_pallas and mesh is not None:
        from surya_tpu.parallel import mesh as meshlib

        # shard_map needs exact divisibility (B over data, q+kv heads over
        # model); odd meshes fall back to the GSPMD-partitionable dense path
        if not meshlib.kernel_shardable(
            mesh, B, config.num_attention_heads, config.num_key_value_heads
        ):
            use_pallas = False
            mesh = None
    if use_pallas and mesh is not None:
        from surya_tpu.ops import flash

        attend = lambda q, k, v: flash.causal_flash_attention_shard_map(q, k, v, mesh)  # noqa: E731
    elif use_pallas:
        from surya_tpu.ops import flash

        attend = flash.causal_flash_attention  # logits never touch HBM
    else:
        causal = att.mask_to_bias(jnp.tril(jnp.ones((L, L), bool)))[None, None]
        attend = lambda q, k, v: att.sdpa(q, k, v, bias=causal)  # noqa: E731

    x = embeds
    ks, vs = [], []
    for layer in params["layers"]:
        h = nn.rmsnorm(layer["input_layernorm"], x, eps=config.rms_norm_eps)
        q, k, v = _proj_qkv(layer["self_attn"], h, config)
        q, k = att.apply_rope(q, k, cos, sin)
        ks.append(k)
        vs.append(v)
        out = attend(q, k, v)
        x = x + nn.linear(layer["self_attn"]["o_proj"], out.reshape(B, L, -1))
        x = x + _mlp(layer["mlp"], nn.rmsnorm(layer["post_attention_layernorm"], x, eps=config.rms_norm_eps))

    x = nn.rmsnorm(params["norm"], x, eps=config.rms_norm_eps)
    last_hidden = jnp.take_along_axis(x, (seq_lens - 1)[:, None, None], axis=1)[:, 0]
    return jnp.stack(ks), jnp.stack(vs), last_hidden


def merge_prefill(cache: dict, new_k, new_v, seq_lens, slot_idx):
    """Scatter a prefill's KV rows into cache slots (left-aligned) and set the
    slot lengths. new_k/new_v: [layers, B, L, kvh, hd] (prefill layout);
    slot_idx: [B] target slot per prefill row."""
    L = new_k.shape[2]
    # prefill layout [layers, B, L, kvh, hd] -> cache layout [layers, B, kvh, L, hd]
    new_k = new_k.transpose(0, 1, 3, 2, 4)
    new_v = new_v.transpose(0, 1, 3, 2, 4)
    out = dict(cache)
    if "k_scale" in cache:
        qk, sk = quantize_kv(new_k)
        qv, sv = quantize_kv(new_v)
        out["k"] = cache["k"].at[:, slot_idx, :, :L].set(qk)
        out["v"] = cache["v"].at[:, slot_idx, :, :L].set(qv)
        out["k_scale"] = cache["k_scale"].at[:, slot_idx, :, :L].set(sk)
        out["v_scale"] = cache["v_scale"].at[:, slot_idx, :, :L].set(sv)
    else:
        out["k"] = cache["k"].at[:, slot_idx, :, :L].set(new_k)
        out["v"] = cache["v"].at[:, slot_idx, :, :L].set(new_v)
    out["len"] = cache["len"].at[slot_idx].set(seq_lens)
    return out


def decode_step_chunked(
    params,
    config: DecoderConfig,
    cache: dict,
    chunk_k: jnp.ndarray,  # [layers, B, kvh, K, hd] — this chunk's KV buffer
    chunk_v: jnp.ndarray,
    embeds: jnp.ndarray,  # [B, hidden]
    step: jnp.ndarray,  # scalar: index within the chunk
    base_len: jnp.ndarray,  # [B] cache length at chunk start (frozen)
    use_pallas=None,  # None = auto from settings; False forces the jnp path
    mesh=None,  # shard_map the kernel over this mesh (multi-chip)
):
    """One decode token with the big cache READ-ONLY.

    New KV lands in the small chunk buffer at column `step` (a dynamic-update
    -slice, identical index for every row). Attention merges two pieces —
    the frozen cache (rows < base_len) and the chunk buffer (cols <= step) —
    via the fused GQA decode kernel (surya_tpu/ops/decode_attn.py). Writing
    the big [layers, slots, kvh, max_seq] cache per step costs a full-array
    copy per layer inside lax.while_loop — this layout makes the hot loop
    write only the K-column buffer; the caller commits the chunk to the cache
    once at the end (commit_chunk).

    Returns (chunk_k, chunk_v, hidden [B, hidden]).
    """
    from surya_tpu.ops import decode_attn

    B = embeds.shape[0]
    pos = base_len + step
    cos, sin = _rope_cos_sin(config, pos.astype(jnp.float32)[:, None])
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    quantized = "k_scale" in cache
    x = embeds[:, None, :]
    for li, layer in enumerate(params["layers"]):
        h = nn.rmsnorm(layer["input_layernorm"], x, eps=config.rms_norm_eps)
        q, k, v = _proj_qkv(layer["self_attn"], h, config)
        q, k = att.apply_rope(q, k, cos, sin)
        chunk_k = chunk_k.at[li, :, :, step].set(k[:, 0])
        chunk_v = chunk_v.at[li, :, :, step].set(v[:, 0])
        # the FULL cache/chunk arrays go in; the layer is selected inside the
        # kernel's index maps (slicing [li] here would materialize a per-layer
        # copy of the whole cache as the pallas operand every step)
        out = decode_attn.gqa_decode(
            q[:, 0], cache["k"], cache["v"], base_len,
            chunk_k, chunk_v, step, li,
            k_scale=cache["k_scale"] if quantized else None,
            v_scale=cache["v_scale"] if quantized else None,
            use_pallas=use_pallas, mesh=mesh,
        )
        x = x + nn.linear(layer["self_attn"]["o_proj"], out.reshape(B, 1, -1))
        x = x + _mlp(layer["mlp"], nn.rmsnorm(layer["post_attention_layernorm"], x, eps=config.rms_norm_eps))

    x = nn.rmsnorm(params["norm"], x, eps=config.rms_norm_eps)
    return chunk_k, chunk_v, x[:, 0]


def commit_chunk(cache: dict, chunk_k, chunk_v, base_len, advance):
    """Scatter a finished chunk's KV ([layers, B, kvh, K, hd]) into the slot
    cache at rows [base_len, base_len + K) per slot and advance the lengths
    by each slot's active-step count. Garbage columns (steps after a slot
    finished) land beyond the new length and stay masked."""
    K = chunk_k.shape[3]
    S = cache["k"].shape[3]
    kvh = chunk_k.shape[2]
    slots = jnp.arange(cache["k"].shape[1])[:, None, None]  # [B, 1, 1]
    heads = jnp.arange(kvh)[None, :, None]  # [1, kvh, 1]
    rows = jnp.minimum(base_len[:, None, None] + jnp.arange(K)[None, None, :], S - 1)  # [B, 1, K]
    out = dict(cache)
    if "k_scale" in cache:
        qk, sk = quantize_kv(chunk_k)
        qv, sv = quantize_kv(chunk_v)
        out["k"] = cache["k"].at[:, slots, heads, rows].set(qk)
        out["v"] = cache["v"].at[:, slots, heads, rows].set(qv)
        out["k_scale"] = cache["k_scale"].at[:, slots, heads, rows].set(sk)
        out["v_scale"] = cache["v_scale"].at[:, slots, heads, rows].set(sv)
    else:
        out["k"] = cache["k"].at[:, slots, heads, rows].set(chunk_k)
        out["v"] = cache["v"].at[:, slots, heads, rows].set(chunk_v)
    out["len"] = cache["len"] + advance.astype(jnp.int32)
    return out


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(bag, config: DecoderConfig, prefix: str = "decoder"):
    layers = []
    for i in range(config.num_hidden_layers):
        b = f"{prefix}.layers.{i}"
        layers.append(
            {
                "input_layernorm": bag.rmsnorm(f"{b}.input_layernorm"),
                "post_attention_layernorm": bag.rmsnorm(f"{b}.post_attention_layernorm"),
                "self_attn": {
                    "q_proj": bag.linear(f"{b}.self_attn.q_proj"),
                    "k_proj": bag.linear(f"{b}.self_attn.k_proj"),
                    "v_proj": bag.linear(f"{b}.self_attn.v_proj"),
                    "o_proj": bag.linear(f"{b}.self_attn.o_proj", bias=False),
                },
                "mlp": {
                    "gate_proj": bag.linear(f"{b}.mlp.gate_proj", bias=False),
                    "up_proj": bag.linear(f"{b}.mlp.up_proj", bias=False),
                    "down_proj": bag.linear(f"{b}.mlp.down_proj", bias=False),
                },
            }
        )
    return {"layers": layers, "norm": bag.rmsnorm(f"{prefix}.norm")}
