"""Multi-chip execution: device mesh + sharding rules.

The reference has no distributed runtime at all (SURVEY.md §2.10) — its
throughput is single-device batching. Here scale-out is first-class and
purely declarative, the XLA way: a 2-D (data, model) mesh, batch axes sharded
over `data`, and an optional tensor-parallel sharding of the recognition
decoder (following the reference's unused HF TP plan hints,
surya/common/surya/decoder/config.py:13-27: q/k/v/gate/up column-wise,
o/down row-wise). jit + sharding propagation inserts all_gather/psum on ICI;
nothing in the model code changes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from surya_tpu.settings import settings

DATA_AXIS = settings.MESH_DATA_AXIS
MODEL_AXIS = settings.MESH_MODEL_AXIS


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_model = n_model or settings.MESH_NUM_MODEL_SHARDS
    n_data = n_data or len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch / slots) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def kernel_shardable(mesh: Mesh, batch: int, *head_counts: int) -> bool:
    """True when the Pallas shard_map wrappers can partition these dims.

    shard_map needs exact divisibility (unlike GSPMD, which pads); an odd
    mesh (model axis not dividing kv heads, data axis not dividing the slot
    count) must fall back to the jnp path instead of crashing at trace time
    inside the jitted program."""
    if batch % mesh.shape[DATA_AXIS] != 0:
        return False
    n_model = mesh.shape[MODEL_AXIS]
    return n_model == 1 or all(h % n_model == 0 for h in head_counts)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _decoder_tp_spec(path: tuple) -> P:
    """TP plan for the recognition decoder params: column-parallel in-proj
    kernels, row-parallel out-proj kernels, everything else replicated.
    int8 kernels (kernel_q) shard like their float counterparts; their
    per-output-channel scales shard like biases."""
    keys = [str(k) for k in path]
    if "kernel" in keys or "kernel_q" in keys:
        for col in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            if col in keys:
                return P(None, MODEL_AXIS)
        for row in ("o_proj", "down_proj"):
            if row in keys:
                return P(MODEL_AXIS, None)
    if "bias" in keys or "scale" in keys:
        for col in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
            if col in keys:
                return P(MODEL_AXIS)
    return P()


def shard_foundation_params(params: dict, mesh: Mesh) -> dict:
    """Place foundation-model params: decoder tensor-parallel over the model
    axis (when the mesh has >1 model shard), everything else replicated."""
    use_tp = mesh.shape[MODEL_AXIS] > 1

    def place(path, leaf):
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        spec = P()
        if use_tp and keys and keys[0] == "decoder":
            spec = _decoder_tp_spec(tuple(str(k) for k in keys))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def cache_sharding(mesh: Mesh) -> dict:
    """KV cache: slots over data, kv heads over model (matches column-parallel
    k/v projections). Includes int8-cache scale specs."""
    use_tp = mesh.shape[MODEL_AXIS] > 1
    head = MODEL_AXIS if use_tp else None
    # cache layout [layers, slots, kvh, max_seq, hd]
    kv_spec = P(None, DATA_AXIS, head, None, None)
    return {
        "k": NamedSharding(mesh, kv_spec),
        "v": NamedSharding(mesh, kv_spec),
        "k_scale": NamedSharding(mesh, P(None, DATA_AXIS, head, None)),
        "v_scale": NamedSharding(mesh, P(None, DATA_AXIS, head, None)),
        "len": NamedSharding(mesh, P(DATA_AXIS)),
    }
