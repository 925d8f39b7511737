"""Qwen2.5-VL-style windowed vision transformer (recognition encoder), in JAX.

TPU-native re-design of the reference encoder
(surya/common/surya/encoder/__init__.py:420-699). The reference packs all line
crops into one ragged sequence and drives flash-attn with cu_seqlens; ragged
shapes don't compile on TPU, so here every raggedness is resolved on HOST into
static-shape index arrays (a "layout plan"), and the device program is pure
dense math:

  - patch embed = one matmul (the reference's Conv3d has kernel == stride:
    encoder/__init__.py:38-73)
  - window attention (6 of 8 blocks) runs as dense [n_windows, 64, D]
    attention — each 112px window is exactly 64 patches (16 merged cells),
    edge windows are padded with masked slots rather than packed
    (reference get_window_index packs them: :552-597)
  - full-attention blocks (3, 7) run over the flat padded sequence with a
    per-image segment mask, computed in query chunks to bound memory
  - 2x2 PatchMerger operates on the window layout where merge cells are
    contiguous, then a host-planned gather restores original token order
    (reference uses argsort(window_index): :666-668)

Sequence capacity is padded to a fixed bucket so XLA compiles one program per
bucket. All index arrays come from plan_layout() (numpy, exact mirror of the
reference's window ordering).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surya_tpu import nn
from surya_tpu.ops import attention as att


@dataclass(frozen=True)
class EncoderConfig:
    depth: int = 8
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 1
    window_size: int = 112
    out_hidden_size: int = 1280
    fullatt_block_indexes: Tuple[int, ...] = (3, 7)
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def window_cells(self) -> int:
        # merged cells per window side (112 / 2 / 14 = 4)
        return self.window_size // self.spatial_merge_size // self.patch_size

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2

    @property
    def window_patches(self) -> int:
        # patches per window (4*4 cells × 4 patches = 64)
        return self.window_cells**2 * self.merge_unit


FULL_ATTN_Q_CHUNK = 128  # rows per full-attention query chunk


@dataclass
class EncoderLayout:
    """Host-computed static-shape layout plan for one packed batch.

    cap: padded patch capacity (window layout length, multiple of
    window_patches). llm_cap = cap // merge_unit.
    """

    cap: int
    n_patches: int  # real patches (raw layout)
    n_llm_tokens: int  # real merged tokens across all images
    patch_gather: np.ndarray  # [cap] raw-layout index per window-order slot
    pos_hw: np.ndarray  # [cap, 2] patch (h, w) within image, window order
    seg_id: np.ndarray  # [cap] image id per slot, -1 for padding
    unscatter: np.ndarray  # [llm_cap] window-order cell idx per original-order token
    llm_h_idx: np.ndarray  # [llm_cap] row index for 2D learned embedding
    llm_w_idx: np.ndarray  # [llm_cap] col index for 2D learned embedding
    tokens_per_image: List[int]
    kv_starts: np.ndarray  # [cap // Q_CHUNK] KV window start per query chunk
    kv_range: int  # static KV window length covering any chunk's images


def plan_layout(
    grids: List[Tuple[int, int]],
    config: EncoderConfig,
    cap: int,
    embed_encoding_multiplier: int = 256,
) -> EncoderLayout:
    """Compute the window-order layout for a list of per-image patch grids
    (h, w in patch units; both multiples of spatial_merge_size).

    Mirrors the reference get_window_index (encoder/__init__.py:552-597) and
    rot_pos_emb (:523-550), except edge windows keep padded slots (masked)
    instead of being packed to variable length."""
    ms = config.spatial_merge_size
    wc = config.window_cells
    mu = config.merge_unit

    patch_gather, pos_h, pos_w, seg = [], [], [], []
    cell_src: List[int] = []  # window-order cell -> original-order token idx (-1 pad)
    raw_base = 0
    llm_base = 0
    for img_idx, (h, w) in enumerate(grids):
        llm_h, llm_w = h // ms, w // ms
        n_win_h = -(-llm_h // wc)
        n_win_w = -(-llm_w // wc)
        for win_r in range(n_win_h):
            for win_c in range(n_win_w):
                for cr in range(wc):
                    for cc in range(wc):
                        r = win_r * wc + cr
                        c = win_c * wc + cc
                        valid = r < llm_h and c < llm_w
                        if valid:
                            cell_src.append(llm_base + r * llm_w + c)
                        else:
                            cell_src.append(-1)
                        for dr in range(ms):
                            for dc in range(ms):
                                if valid:
                                    raw_idx = ((r * llm_w + c) * ms + dr) * ms + dc
                                    patch_gather.append(raw_base + raw_idx)
                                    pos_h.append(r * ms + dr)
                                    pos_w.append(c * ms + dc)
                                    seg.append(img_idx)
                                else:
                                    patch_gather.append(0)
                                    pos_h.append(0)
                                    pos_w.append(0)
                                    seg.append(-1)
        raw_base += h * w
        llm_base += llm_h * llm_w

    n_slots = len(patch_gather)
    if n_slots > cap:
        raise ValueError(f"layout needs {n_slots} slots > capacity {cap}")
    if cap % FULL_ATTN_Q_CHUNK:
        raise ValueError(f"capacity {cap} must be a multiple of {FULL_ATTN_Q_CHUNK}")
    pad = cap - n_slots
    patch_gather = np.asarray(patch_gather + [0] * pad, np.int32)
    pos_hw = np.stack(
        [np.asarray(pos_h + [0] * pad, np.int32), np.asarray(pos_w + [0] * pad, np.int32)],
        axis=-1,
    )
    seg_id = np.asarray(seg + [-1] * pad, np.int32)

    # original-order token -> window-order cell
    llm_cap = cap // mu
    cell_src_arr = np.asarray(cell_src + [-1] * (llm_cap - len(cell_src)), np.int64)
    unscatter = np.zeros(llm_cap, np.int32)
    order = np.nonzero(cell_src_arr >= 0)[0]
    unscatter[cell_src_arr[order]] = order.astype(np.int32)

    # per-token 2D learned-embedding indices, original order
    # (reference get_2d_learned_embeddings: common/surya/__init__.py:233-272)
    h_idx, w_idx, tokens_per_image = [], [], []
    for h, w in grids:
        llm_h, llm_w = h // ms, w // ms
        rows = np.arange(llm_h) / max(1, llm_h - 1) * embed_encoding_multiplier
        cols = np.arange(llm_w) / max(1, llm_w - 1) * embed_encoding_multiplier
        h_idx.append(np.repeat(rows.astype(np.int32), llm_w))
        w_idx.append(np.tile(cols.astype(np.int32), llm_h))
        tokens_per_image.append(llm_h * llm_w)
    h_idx = np.concatenate(h_idx) if h_idx else np.zeros(0, np.int32)
    w_idx = np.concatenate(w_idx) if w_idx else np.zeros(0, np.int32)
    n_llm = int(h_idx.shape[0])
    llm_h_idx = np.zeros(llm_cap, np.int32)
    llm_w_idx = np.zeros(llm_cap, np.int32)
    llm_h_idx[:n_llm] = h_idx
    llm_w_idx[:n_llm] = w_idx

    # Full attention is per image, and images occupy CONTIGUOUS window-order
    # slot runs — so each fixed query chunk only needs the contiguous KV
    # window spanning the images it touches. Host-plan those windows; the
    # device then does O(cap * kv_range) work instead of O(cap^2)
    # (the TPU replacement for varlen flash attention's cu_seqlens).
    # image runs: consecutive slots sharing a seg id (pads attach to their own
    # run so fully-padded chunks self-attend harmlessly)
    seg_arr = seg_id.astype(np.int64)
    change = np.flatnonzero(np.diff(seg_arr)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [cap]])
    slot_image_start = np.repeat(starts, ends - starts)
    slot_image_end = np.repeat(ends, ends - starts)

    BQ = FULL_ATTN_Q_CHUNK
    KV_ALIGN = 512  # starts aligned so the Pallas kernel can index KV blocks
    n_chunks = cap // BQ
    kv_starts = np.zeros(n_chunks, np.int32)
    kv_range = BQ
    for ci in range(n_chunks):
        lo = (int(slot_image_start[ci * BQ]) // KV_ALIGN) * KV_ALIGN
        hi = int(slot_image_end[min(ci * BQ + BQ, cap) - 1])
        kv_starts[ci] = lo
        kv_range = max(kv_range, hi - lo)
    kv_range = min(cap, -(-kv_range // KV_ALIGN) * KV_ALIGN)
    kv_starts = np.minimum(kv_starts, cap - kv_range).astype(np.int32)

    return EncoderLayout(
        cap=cap,
        n_patches=raw_base,
        n_llm_tokens=n_llm,
        patch_gather=patch_gather,
        pos_hw=pos_hw,
        seg_id=seg_id,
        unscatter=unscatter,
        llm_h_idx=llm_h_idx,
        llm_w_idx=llm_w_idx,
        tokens_per_image=tokens_per_image,
        kv_starts=kv_starts,
        kv_range=kv_range,
    )


# -- params -------------------------------------------------------------------

def init_params(config: EncoderConfig, key, dtype=jnp.float32):
    ks = nn.key_iter(key)
    h = config.hidden_size
    blocks = []
    for _ in range(config.depth):
        blocks.append(
            {
                "norm1": nn.rmsnorm_init(h, dtype),
                "norm2": nn.rmsnorm_init(h, dtype),
                "attn": {
                    "qkv": nn.linear_init(next(ks), h, 3 * h, dtype=dtype),
                    "proj": nn.linear_init(next(ks), h, h, dtype=dtype),
                },
                "mlp": {
                    "gate_proj": nn.linear_init(next(ks), h, config.intermediate_size, dtype=dtype),
                    "up_proj": nn.linear_init(next(ks), h, config.intermediate_size, dtype=dtype),
                    "down_proj": nn.linear_init(next(ks), config.intermediate_size, h, dtype=dtype),
                },
            }
        )
    merge_in = h * config.merge_unit
    return {
        "patch_embed": nn.linear_init(next(ks), config.patch_dim, h, bias=False, dtype=dtype),
        "blocks": blocks,
        "merger": {
            "ln_q": nn.rmsnorm_init(h, dtype),
            "mlp0": nn.linear_init(next(ks), merge_in, merge_in, dtype=dtype),
            "mlp2": nn.linear_init(next(ks), merge_in, config.out_hidden_size, dtype=dtype),
        },
    }


# -- forward ------------------------------------------------------------------

def _mlp(p, x):
    return nn.linear(p["down_proj"], jax.nn.silu(nn.linear(p["gate_proj"], x)) * nn.linear(p["up_proj"], x))


def _rope_tables(config: EncoderConfig, pos_hw: jnp.ndarray):
    """2-D vision RoPE: angle table is [freqs(h), freqs(w)] duplicated to
    head_dim (reference rot_pos_emb :523-550 + emb=cat((r,r)) :640)."""
    half = config.head_dim // 4  # freqs per axis
    inv_freq = 1.0 / (config.rope_theta ** (jnp.arange(0, half * 2, 2, dtype=jnp.float32) / (half * 2)))
    fh = pos_hw[:, 0].astype(jnp.float32)[:, None] * inv_freq
    fw = pos_hw[:, 1].astype(jnp.float32)[:, None] * inv_freq
    ang = jnp.concatenate([fh, fw], axis=-1)
    ang = jnp.concatenate([ang, ang], axis=-1)  # [cap, head_dim]
    return jnp.cos(ang), jnp.sin(ang)


def _qkv(p, x, num_heads, head_dim):
    out = nn.linear(p["qkv"], x)
    out = out.reshape(*x.shape[:-1], 3, num_heads, head_dim)
    return out[..., 0, :, :], out[..., 1, :, :], out[..., 2, :, :]


def _window_attention(p, x, cos, sin, win_bias, config: EncoderConfig):
    """Dense attention within each 64-patch window: [W, 64, D]."""
    wp = config.window_patches
    W = x.shape[0] // wp
    xw = x.reshape(W, wp, -1)
    q, k, v = _qkv(p, xw, config.num_heads, config.head_dim)
    cos_w = cos.reshape(W, wp, 1, -1)
    sin_w = sin.reshape(W, wp, 1, -1)
    q, k = att.apply_rope(q, k, cos_w, sin_w)
    out = att.sdpa(q, k, v, bias=win_bias)
    out = out.reshape(W, wp, config.hidden_size)
    return nn.linear(p["proj"], out).reshape(x.shape)


def _full_attention(p, x, cos, sin, seg_id, kv_starts, kv_range: int, config: EncoderConfig):
    """Per-image full attention over the flat window-order sequence. Each
    fixed query chunk attends only its host-planned contiguous KV window
    (images are contiguous slot runs), masked by segment id inside the window
    — O(cap * kv_range) instead of O(cap^2). TPU replacement for the
    reference's varlen flash attention at full-attn blocks 3 & 7."""
    cap = x.shape[0]
    q, k, v = _qkv(p, x[None], config.num_heads, config.head_dim)
    q, k = att.apply_rope(q, k, cos[None, :, None, :], sin[None, :, None, :])
    q, k, v = q[0], k[0], v[0]  # [cap, H, D]
    scale = config.head_dim**-0.5

    from surya_tpu.settings import settings

    if settings.USE_PALLAS_ATTENTION and settings.DEVICE != "cpu":
        from surya_tpu.ops import flash

        out = flash.segmented_block_attention(
            q, k, v, seg_id, kv_starts, kv_range, block_q=FULL_ATTN_Q_CHUNK, block_k=512
        )
        return nn.linear(p["proj"], out.reshape(cap, config.hidden_size))

    q_chunk = min(FULL_ATTN_Q_CHUNK, cap)
    kv_range = min(kv_range, cap)
    n_chunks = cap // q_chunk

    def chunk_fn(ci):
        qs = jax.lax.dynamic_slice_in_dim(q, ci * q_chunk, q_chunk, axis=0)
        seg_q = jax.lax.dynamic_slice_in_dim(seg_id, ci * q_chunk, q_chunk, axis=0)
        start = kv_starts[ci]
        ks = jax.lax.dynamic_slice_in_dim(k, start, kv_range, axis=0)
        vs = jax.lax.dynamic_slice_in_dim(v, start, kv_range, axis=0)
        seg_k = jax.lax.dynamic_slice_in_dim(seg_id, start, kv_range, axis=0)
        logits = jnp.einsum("qhd,khd->hqk", qs, ks).astype(jnp.float32) * scale
        mask = seg_q[:, None] == seg_k[None, :]
        logits = jnp.where(mask[None], logits, att.NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("hqk,khd->qhd", probs, vs)

    out = jax.lax.map(chunk_fn, jnp.arange(n_chunks))
    out = out.reshape(cap, config.hidden_size)
    return nn.linear(p["proj"], out)


def apply(params, config: EncoderConfig, patches, patch_gather, pos_hw, seg_id, unscatter, kv_starts=None, kv_range: int = 0):
    """Encode a packed batch of image patches.

    patches: [cap, patch_dim] raw-order flattened patches (zero padded)
    patch_gather/pos_hw/seg_id/unscatter/kv_starts: from plan_layout (device
    arrays); kv_range: the plan's static full-attention window (0 = whole cap)
    Returns merged image tokens [cap // merge_unit, out_hidden] in ORIGINAL
    (pre-window-shuffle) order; rows beyond n_llm_tokens are garbage and must
    be masked by the caller.
    """
    if kv_starts is None:
        kv_starts = jnp.zeros((patches.shape[0] // FULL_ATTN_Q_CHUNK,), jnp.int32)
        kv_range = patches.shape[0]
    x = nn.linear(params["patch_embed"], patches)
    x = jnp.take(x, patch_gather, axis=0)  # raw order -> window order
    cos, sin = _rope_tables(config, pos_hw)

    wp = config.window_patches
    W = x.shape[0] // wp
    valid = (seg_id >= 0).reshape(W, wp)
    # keys: valid slots only; fully-padded windows attend self to stay finite
    win_mask = valid[:, None, :] | jnp.eye(wp, dtype=bool)[None]
    win_bias = att.mask_to_bias(win_mask[:, None, :, :])  # [W, 1, q, k]

    for i, block in enumerate(params["blocks"]):
        h = nn.rmsnorm(block["norm1"], x)
        if i in config.fullatt_block_indexes:
            attn_out = _full_attention(block["attn"], h, cos, sin, seg_id, kv_starts, kv_range, config)
        else:
            attn_out = _window_attention(block["attn"], h, cos, sin, win_bias, config)
        x = x + attn_out
        x = x + _mlp(block["mlp"], nn.rmsnorm(block["norm2"], x))

    # 2x2 merge: cells are contiguous in window order
    merger = params["merger"]
    x = nn.rmsnorm(merger["ln_q"], x)
    cells = x.reshape(-1, config.merge_unit * config.hidden_size)
    # torch nn.GELU() default is the exact (erf) form
    merged = nn.linear(merger["mlp2"], jax.nn.gelu(nn.linear(merger["mlp0"], cells), approximate=False))
    return jnp.take(merged, unscatter, axis=0)  # window order -> original order


# -- checkpoint conversion ----------------------------------------------------

def convert_torch(bag, config: EncoderConfig, prefix: str = "vision_encoder"):
    """Map the reference torch encoder state dict onto init_params' pytree.
    Conv3d patch embed [out, in, t, p, p] flattens to a [in*t*p*p, out] matmul
    kernel (kernel == stride, so conv ≡ per-patch linear)."""
    pre = f"{prefix}." if prefix else ""
    w = bag._take(f"{pre}patch_embed.proj.weight")
    patch_kernel = w.reshape(w.shape[0], -1).T  # [in*t*p*p, out]

    blocks = []
    for i in range(config.depth):
        b = f"{pre}blocks.{i}"
        blocks.append(
            {
                "norm1": bag.rmsnorm(f"{b}.norm1"),
                "norm2": bag.rmsnorm(f"{b}.norm2"),
                "attn": {
                    "qkv": bag.linear(f"{b}.attn.qkv"),
                    "proj": bag.linear(f"{b}.attn.proj"),
                },
                "mlp": {
                    "gate_proj": bag.linear(f"{b}.mlp.gate_proj"),
                    "up_proj": bag.linear(f"{b}.mlp.up_proj"),
                    "down_proj": bag.linear(f"{b}.mlp.down_proj"),
                },
            }
        )
    return {
        "patch_embed": {"kernel": jnp.asarray(patch_kernel, bag.dtype)},
        "blocks": blocks,
        "merger": {
            "ln_q": bag.rmsnorm(f"{pre}merger.ln_q"),
            "mlp0": bag.linear(f"{pre}merger.mlp.0"),
            "mlp2": bag.linear(f"{pre}merger.mlp.2"),
        },
    }
