"""Pallas TPU kernels for the hot attention paths.

`segmented_block_attention` implements the vision encoder's full-attention
blocks: attention over a flat packed sequence where each query may only
attend keys of its own image (segment). Images occupy contiguous slot runs,
so the host plans a contiguous KV window per query block (kv_starts, aligned
to the KV block size) and the kernel runs flash-attention-style online
softmax over just that window — work is O(seq · kv_range), logits never
touch HBM, and the per-block KV offset arrives via scalar prefetch.

This is the TPU replacement for the reference's flash_attn_varlen_func
(surya/common/surya/flash_attn_utils.py:106-154): cu_seqlens become segment
ids + prefetched block ranges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _causal_kernel(q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref, *, scale, block_q, block_k):
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(ik <= iq)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(cols <= rows, s, NEG_INF)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:] = m_new

    @pl.when(ik == iq)
    def _finish():
        out_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def causal_flash_attention(
    q: jnp.ndarray,  # [B, L, H, D] (post-RoPE)
    k: jnp.ndarray,  # [B, L, kvh, D] — GQA: q head h reads kv head h // (H/kvh)
    v: jnp.ndarray,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal self-attention for decoder prefill (right-padded batches).

    TPU replacement for the reference's varlen flash prefill
    (surya/common/surya/flash_attn_utils.py:106-154): the dense-sdpa path
    materializes [B, H, L, L] fp32 logits in HBM (~3.6 GB of traffic per
    layer-step at the 1536 bucket); here logits live in VMEM only. KV blocks
    above the causal diagonal are never fetched (index-map clamping) nor
    computed (pl.when), halving the work vs a full-attention kernel. Padded
    query rows produce garbage outputs that callers discard — with right
    padding, causality alone keeps valid queries off padded keys, matching
    the jnp path's pure-causal bias (models/qwen_decoder.py prefill).

    Returns [B, L, H, D].
    """
    B, L, H, D = q.shape
    kvh = k.shape[2]
    g = H // kvh
    block_q = min(block_q, L)
    while L % block_q:
        block_q //= 2
    block_k = block_q  # equal blocks keep the diagonal logic exact
    n_q = L // block_q
    scale = D**-0.5

    qh = q.transpose(0, 2, 1, 3)  # [B, H, L, D]
    kh = k.transpose(0, 2, 1, 3)  # [B, kvh, L, D]
    vh = v.transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        functools.partial(_causal_kernel, scale=scale, block_q=block_q, block_k=block_k),
        grid=(B, H, n_q, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
            # above-diagonal iterations clamp to the diagonal block: the
            # pipeline sees an unchanged index and skips the DMA
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // g, jnp.minimum(ik, iq), 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // g, jnp.minimum(ik, iq), 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * L * L * D,  # causal: half the dense 4·L² term
            bytes_accessed=(2 * B * H * L * D + 2 * B * kvh * L * D) * q.dtype.itemsize,
            transcendentals=B * H * L * L // 2,
        ),
        interpret=interpret,
    )(qh, kh, vh)
    return out.transpose(0, 2, 1, 3)


def segmented_block_attention_shard_map(
    q, k, v, seg_id, kv_starts, kv_range: int, mesh, block_q: int = 128,
    block_k: int = 512, interpret: bool = False,
):
    """segmented_block_attention under a multi-chip mesh: fully replicated —
    the packed patch sequence is shared prefill state and the vision-encoder
    params are replicated (parallel/mesh.py TP-shards only the decoder), so
    every shard runs the kernel on the whole packed batch, exactly like the
    surrounding replicated encoder math. pallas_call cannot auto-partition,
    so without this wrapper the kernel fails to lower inside a sharded jit
    on real multi-chip hardware (the CPU dryrun never hits it: DEVICE=cpu
    short-circuits to the jnp path)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    qspec = P(None, None, None)

    def local(qs, ks, vs, seg, starts):
        return segmented_block_attention(
            qs, ks, vs, seg, starts, kv_range, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )

    return shard_map(
        local, mesh=mesh, in_specs=(qspec, qspec, qspec, P(None), P(None)),
        out_specs=qspec, check_vma=False,
    )(q, k, v, seg_id, kv_starts)


def causal_flash_attention_shard_map(q, k, v, mesh, interpret: bool = False):
    """causal_flash_attention under a multi-chip mesh: prefill rows shard
    over `data`, heads over `model` (matching the column-parallel q/k/v
    projections) — attention is fully local per shard, so the kernel body
    needs no collectives; the row-parallel o_proj outside psums."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from surya_tpu.parallel import mesh as meshlib

    data, model = meshlib.DATA_AXIS, meshlib.MODEL_AXIS
    h_ax = model if mesh.shape[model] > 1 else None
    spec = P(data, None, h_ax, None)

    def local(qs, ks, vs):
        return causal_flash_attention(qs, ks, vs, interpret=interpret)

    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
    )(q, k, v)


def _kernel(kv_starts_ref, q_ref, k_ref, v_ref, seg_q_ref, seg_k_ref, out_ref, m_ref, l_ref, acc_ref, *, scale, n_kv):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    mask = seg_q_ref[:] == seg_k_ref[:]  # [BQ, 1] == [1, BK] -> [BQ, BK]
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(ik == n_kv - 1)
    def _finish():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


def segmented_block_attention(
    q: jnp.ndarray,  # [S, H, D] (post-RoPE)
    k: jnp.ndarray,
    v: jnp.ndarray,
    seg_id: jnp.ndarray,  # [S] int32, -1 padding
    kv_starts: jnp.ndarray,  # [S // block_q] int32, multiples of block_k
    kv_range: int,  # static, multiple of block_k
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns attention output [S, H, D]."""
    S, H, D = q.shape
    assert S % block_q == 0, (S, block_q)
    kv_range = min(kv_range, S)
    if kv_range % block_k:
        block_k = min(block_k, kv_range)
        while kv_range % block_k:
            block_k //= 2
    n_q = S // block_q
    n_kv = kv_range // block_k
    scale = D**-0.5

    qh = q.transpose(1, 0, 2)  # [H, S, D]
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)
    seg_col = seg_id.reshape(S, 1)
    seg_row = seg_id.reshape(1, S)
    # block-index form of the per-q-block KV offsets for the index maps
    kv_block_starts = kv_starts // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda h, iq, ik, starts: (h, iq, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, iq, ik, starts: (h, starts[iq] + ik, 0)),
            pl.BlockSpec((1, block_k, D), lambda h, iq, ik, starts: (h, starts[iq] + ik, 0)),
            pl.BlockSpec((block_q, 1), lambda h, iq, ik, starts: (iq, 0)),
            pl.BlockSpec((1, block_k), lambda h, iq, ik, starts: (0, starts[iq] + ik)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda h, iq, ik, starts: (h, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_kv=n_kv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * kv_range * H * D,
            bytes_accessed=(3 * S * H * D + S * H * D) * q.dtype.itemsize,
            transcendentals=S * kv_range * H,
        ),
        interpret=interpret,
    )(kv_block_starts, qh, kh, vh, seg_col, seg_row)

    return out.transpose(1, 0, 2)
