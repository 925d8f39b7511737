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
from typing import List, Optional, Tuple

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

    The layout is PACKED: every slot below n_patches is a real patch (no
    window-padding slots at all — the reference's get_window_index pads edge
    windows; here window attention is segment-driven so windows can be any
    size and parity is exact). cap is the padded capacity (bucket).
    """

    cap: int
    n_patches: int  # real patches
    n_llm_tokens: int  # real merged tokens across all images
    patch_gather: np.ndarray  # [cap] raw-layout index per window-order slot
    pos_hw: np.ndarray  # [cap, 2] patch (h, w) within image, window order
    seg_id: np.ndarray  # [cap] image id per slot (pads: unique id per chunk)
    win_id: np.ndarray  # [cap] window id per slot (pads: unique id per chunk)
    unscatter: np.ndarray  # [llm_cap] window-order cell idx per original-order token
    llm_h_idx: np.ndarray  # [llm_cap] row index for 2D learned embedding
    llm_w_idx: np.ndarray  # [llm_cap] col index for 2D learned embedding
    tokens_per_image: List[int]
    kv_starts: np.ndarray  # [cap // Q_CHUNK] full-attn KV window start per q chunk
    kv_range: int  # static full-attn KV window length
    win_starts: np.ndarray  # [cap // Q_CHUNK] window-attn KV start per q chunk
    win_range: int  # static window-attn KV window length

    @property
    def device_args(self):
        """The arrays the encoder program consumes, in apply()'s order."""
        return (
            self.patch_gather, self.pos_hw, self.seg_id, self.win_id,
            self.unscatter, self.kv_starts, self.win_starts,
        )


def plan_layout_sharded(
    shard_grids: "List[List[Tuple[int, int]]]",
    config: "EncoderConfig",
    cap: int,
    embed_encoding_multiplier: int = 256,
    orig_index: "Optional[List[List[int]]]" = None,
) -> EncoderLayout:
    """Stack one plan per data shard into a single EncoderLayout whose arrays
    carry a leading [n_shards] axis (sharded over the mesh's data axis by the
    caller). The static attention ranges are aligned to the max across shards
    so every shard runs the same compiled program; each shard's starts are
    re-clamped to its own capacity. This is what lets the vision encoder's
    prefill FLOPs scale with chips instead of replicating (multi-chip
    prefill: each shard encodes only its own rows' images)."""
    plans = [plan_layout(g, config, cap, embed_encoding_multiplier) for g in shard_grids]
    # tokens_per_image keeps its per-INPUT-image contract: shard grids are
    # LPT-permuted, so restore input order via orig_index when the caller
    # provides the shard->input mapping (flattened group order otherwise)
    tokens_flat = [t for p in plans for t in p.tokens_per_image]
    if orig_index is not None:
        flat_idx = [i for idxs in orig_index for i in idxs]
        restored = [0] * (max(flat_idx) + 1 if flat_idx else 0)
        for i, t in zip(flat_idx, tokens_flat):
            restored[i] = t
        tokens_flat = restored
    kv_range = max(p.kv_range for p in plans)
    win_range = max(p.win_range for p in plans)
    kv_range = min(cap, kv_range)
    win_range = min(cap, win_range)

    def stack(field):
        return np.stack([getattr(p, field) for p in plans])

    return EncoderLayout(
        cap=cap,
        n_patches=sum(p.n_patches for p in plans),
        n_llm_tokens=sum(p.n_llm_tokens for p in plans),
        patch_gather=stack("patch_gather"),
        pos_hw=stack("pos_hw"),
        seg_id=stack("seg_id"),
        win_id=stack("win_id"),
        unscatter=stack("unscatter"),
        llm_h_idx=stack("llm_h_idx"),
        llm_w_idx=stack("llm_w_idx"),
        tokens_per_image=tokens_flat,
        kv_starts=np.stack([np.minimum(p.kv_starts, cap - kv_range) for p in plans]),
        kv_range=kv_range,
        win_starts=np.stack([np.minimum(p.win_starts, cap - win_range) for p in plans]),
        win_range=win_range,
    )


def _chunk_ranges(group_id: np.ndarray, cap: int, chunk: int, align: int):
    """For each `chunk`-slot query block, the contiguous KV window covering
    every group (image or window) it touches. Groups are contiguous runs of
    group_id; starts align down to `align` for the Pallas kernel."""
    change = np.flatnonzero(np.diff(group_id.astype(np.int64))) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [cap]])
    run_start = np.repeat(starts, ends - starts)
    run_end = np.repeat(ends, ends - starts)

    n_chunks = cap // chunk
    kv_starts = np.zeros(n_chunks, np.int32)
    kv_range = chunk
    for ci in range(n_chunks):
        lo = (int(run_start[ci * chunk]) // align) * align
        hi = int(run_end[min(ci * chunk + chunk, cap) - 1])
        kv_starts[ci] = lo
        kv_range = max(kv_range, hi - lo)
    kv_range = min(cap, -(-kv_range // align) * align)
    return np.minimum(kv_starts, cap - kv_range).astype(np.int32), int(kv_range)


def plan_layout(
    grids: List[Tuple[int, int]],
    config: EncoderConfig,
    cap: int,
    embed_encoding_multiplier: int = 256,
) -> EncoderLayout:
    """Compute the packed window-order layout for per-image patch grids
    (h, w in patch units; multiples of spatial_merge_size).

    Cell order mirrors the reference get_window_index partition
    (encoder/__init__.py:552-597): (window row-group, window col-group,
    row-in-group, col-in-group) — but edge groups keep their true (smaller)
    size instead of being padded, so the emitted sequence contains only real
    patches. Attention grouping is carried by win_id/seg_id."""
    ms = config.spatial_merge_size
    wc = config.window_cells
    mu = config.merge_unit

    gathers, pos_hs, pos_ws, segs, wins, cell_srcs = [], [], [], [], [], []
    raw_base = 0
    llm_base = 0
    win_counter = 0
    for img_idx, (h, w) in enumerate(grids):
        llm_h, llm_w = h // ms, w // ms
        blocks = []
        win_sizes = []
        for gr in range(-(-llm_h // wc)):
            r0, r1 = gr * wc, min((gr + 1) * wc, llm_h)
            for gc in range(-(-llm_w // wc)):
                c0, c1 = gc * wc, min((gc + 1) * wc, llm_w)
                block = (np.arange(r0, r1)[:, None] * llm_w + np.arange(c0, c1)[None, :]).ravel()
                blocks.append(block)
                win_sizes.append(block.size)
        cell_idx = np.concatenate(blocks)  # original-order cell index, window order
        n_cells = cell_idx.size

        cell_srcs.append(llm_base + cell_idx)
        # expand cells to their mu patches (raw order within a cell is (dr, dc))
        gathers.append((raw_base + cell_idx[:, None] * mu + np.arange(mu)[None, :]).ravel())
        r = cell_idx // llm_w
        c = cell_idx % llm_w
        dr = np.arange(mu) // ms
        dc = np.arange(mu) % ms
        pos_hs.append((r[:, None] * ms + dr[None, :]).ravel())
        pos_ws.append((c[:, None] * ms + dc[None, :]).ravel())
        segs.append(np.full(n_cells * mu, img_idx))
        wins.append(np.repeat(win_counter + np.arange(len(win_sizes)), np.asarray(win_sizes) * mu))
        win_counter += len(win_sizes)
        raw_base += h * w
        llm_base += llm_h * llm_w

    def cat(parts, pad_value, dtype=np.int32):
        flat = np.concatenate(parts) if parts else np.zeros(0, np.int64)
        out = np.full(cap, pad_value, dtype)
        out[: flat.size] = flat
        return out, int(flat.size)

    if cap % FULL_ATTN_Q_CHUNK:
        raise ValueError(f"capacity {cap} must be a multiple of {FULL_ATTN_Q_CHUNK}")
    n_slots = int(sum(g.size for g in gathers))
    if n_slots > cap:
        raise ValueError(f"layout needs {n_slots} slots > capacity {cap}")

    patch_gather, _ = cat(gathers, 0)
    pos_h, _ = cat(pos_hs, 0)
    pos_w, _ = cat(pos_ws, 0)
    pos_hw = np.stack([pos_h, pos_w], axis=-1)
    # pad slots get a unique group id PER QUERY CHUNK so their attention
    # ranges stay one chunk wide (a shared pad id would make the whole pad
    # tail one giant range)
    pad_ids = -2 - (np.arange(cap) // FULL_ATTN_Q_CHUNK)
    seg_id, _ = cat(segs, 0)
    seg_id[n_slots:] = pad_ids[n_slots:]
    win_id, _ = cat(wins, 0)
    win_id[n_slots:] = pad_ids[n_slots:]

    # original-order token -> window-order cell
    llm_cap = cap // mu
    cell_src_arr = np.concatenate(cell_srcs) if cell_srcs else np.zeros(0, np.int64)
    unscatter = np.zeros(llm_cap, np.int32)
    unscatter[cell_src_arr] = np.arange(cell_src_arr.size, dtype=np.int32)

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

    # Attention ranges: both attention flavors are "ranged segmented
    # attention" — each fixed query chunk attends a contiguous KV window
    # covering its groups (images for full-attn blocks, windows for the
    # rest), masked by group id inside the window. This is the TPU
    # replacement for varlen flash attention's cu_seqlens.
    kv_starts, kv_range = _chunk_ranges(seg_id, cap, FULL_ATTN_Q_CHUNK, align=512)
    win_starts, win_range = _chunk_ranges(win_id, cap, FULL_ATTN_Q_CHUNK, align=128)

    return EncoderLayout(
        cap=cap,
        n_patches=raw_base,
        n_llm_tokens=n_llm,
        patch_gather=patch_gather,
        pos_hw=pos_hw,
        seg_id=seg_id,
        win_id=win_id,
        unscatter=unscatter,
        llm_h_idx=llm_h_idx,
        llm_w_idx=llm_w_idx,
        tokens_per_image=tokens_per_image,
        kv_starts=kv_starts,
        kv_range=kv_range,
        win_starts=win_starts,
        win_range=win_range,
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


def _ranged_attention(p, x, cos, sin, group_id, kv_starts, kv_range: int, config: EncoderConfig, block_k: int, mesh=None):
    """Segmented ranged attention over the flat packed sequence: each fixed
    query chunk attends its host-planned contiguous KV window, masked by
    group id inside the window — O(cap * kv_range) instead of O(cap^2).
    Groups are windows for windowed blocks and whole images for the
    full-attention blocks (the TPU replacement for the reference's varlen
    flash attention, encoder/__init__.py:552-666)."""
    cap = x.shape[0]
    q, k, v = _qkv(p, x[None], config.num_heads, config.head_dim)
    q, k = att.apply_rope(q, k, cos[None, :, None, :], sin[None, :, None, :])
    q, k, v = q[0], k[0], v[0]  # [cap, H, D]
    scale = config.head_dim**-0.5

    from surya_tpu.settings import settings

    if settings.USE_PALLAS_ATTENTION and settings.DEVICE != "cpu":
        from surya_tpu.ops import flash

        if mesh is not None:  # pallas_call can't auto-partition in a sharded jit
            out = flash.segmented_block_attention_shard_map(
                q, k, v, group_id, kv_starts, kv_range, mesh,
                block_q=FULL_ATTN_Q_CHUNK, block_k=block_k,
            )
        else:
            out = flash.segmented_block_attention(
                q, k, v, group_id, kv_starts, kv_range, block_q=FULL_ATTN_Q_CHUNK, block_k=block_k
            )
        return nn.linear(p["proj"], out.reshape(cap, config.hidden_size))

    q_chunk = min(FULL_ATTN_Q_CHUNK, cap)
    kv_range = min(kv_range, cap)
    n_chunks = cap // q_chunk

    def chunk_fn(ci):
        qs = jax.lax.dynamic_slice_in_dim(q, ci * q_chunk, q_chunk, axis=0)
        seg_q = jax.lax.dynamic_slice_in_dim(group_id, ci * q_chunk, q_chunk, axis=0)
        start = kv_starts[ci]
        ks = jax.lax.dynamic_slice_in_dim(k, start, kv_range, axis=0)
        vs = jax.lax.dynamic_slice_in_dim(v, start, kv_range, axis=0)
        seg_k = jax.lax.dynamic_slice_in_dim(group_id, start, kv_range, axis=0)
        logits = jnp.einsum("qhd,khd->hqk", qs, ks).astype(jnp.float32) * scale
        mask = seg_q[:, None] == seg_k[None, :]
        logits = jnp.where(mask[None], logits, att.NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("hqk,khd->qhd", probs, vs)

    out = jax.lax.map(chunk_fn, jnp.arange(n_chunks))
    out = out.reshape(cap, config.hidden_size)
    return nn.linear(p["proj"], out)


def apply(params, config: EncoderConfig, patches, patch_gather, pos_hw, seg_id, win_id, unscatter, kv_starts, win_starts, kv_range: int, win_range: int, mesh=None):
    """Encode a packed batch of image patches.

    patches: [cap, patch_dim] raw-order flattened patches (zero padded); the
    remaining arrays and the two static range lengths come from plan_layout.
    Returns merged image tokens [cap // merge_unit, out_hidden] in ORIGINAL
    (pre-window-shuffle) order; rows beyond n_llm_tokens are garbage and must
    be masked by the caller.
    """
    x = nn.linear(params["patch_embed"], patches)
    x = jnp.take(x, patch_gather, axis=0)  # raw order -> window order
    cos, sin = _rope_tables(config, pos_hw)

    for i, block in enumerate(params["blocks"]):
        h = nn.rmsnorm(block["norm1"], x)
        if i in config.fullatt_block_indexes:
            attn_out = _ranged_attention(block["attn"], h, cos, sin, seg_id, kv_starts, kv_range, config, block_k=512, mesh=mesh)
        else:
            attn_out = _ranged_attention(block["attn"], h, cos, sin, win_id, win_starts, win_range, config, block_k=128, mesh=mesh)
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
