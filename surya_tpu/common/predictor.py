"""BasePredictor: the uniform task API (reference: surya/common/predictor.py:9-57).

Every capability (detection, recognition, layout, table rec, OCR error) is a
predictor: construction loads (or randomly initializes) weights and builds the
jitted device programs; ``__call__`` maps PIL images / text to typed results.

TPU invariants baked in here:
  - static batch shapes: inputs are always padded to the configured batch
    size so each predictor compiles exactly one program per input geometry
  - uint8 pixels cross the host→device boundary; rescale/normalize run
    inside the jitted graph
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from surya_tpu.settings import settings


class BasePredictor:
    # per-platform default batch sizes; subclasses override
    default_batch_sizes: Dict[str, int] = {"cpu": 2, "tpu": 32}
    batch_size: Optional[int] = None
    mesh = None  # set by setup_mesh() when USE_MESH is on

    def __init__(self, checkpoint: Optional[str] = None):
        self.disable_tqdm = settings.DISABLE_TQDM
        self._load(checkpoint)

    def _load(self, checkpoint: Optional[str]):
        raise NotImplementedError

    def get_batch_size(self) -> int:
        if self.batch_size is not None:
            return self.batch_size
        return self.default_batch_sizes[settings.DEVICE]

    def setup_mesh(self):
        """dp mesh for batch-sharded predictors (USE_MESH): replicate params
        over every device, remember the mesh so forward inputs can shard
        their batch axis over the data axis. Call at the end of _load."""
        import jax

        self.mesh = None
        if len(jax.devices()) > 1 and settings.USE_MESH:
            from surya_tpu.parallel import mesh as meshlib

            self.mesh = meshlib.make_mesh(n_model=1)
            rep = meshlib.replicated(self.mesh)
            self.params = jax.tree.map(lambda x: jax.device_put(x, rep), self.params)

    def shard_pixels(self, arr):
        """Place a [B, ...] batch on the mesh's data axis (replicating when
        no mesh is active). B must be a multiple of the data-axis size —
        round_batch guarantees that for bucketed batches."""
        import jax

        if self.mesh is None:
            return jax.device_put(arr)
        from surya_tpu.parallel import mesh as meshlib

        return jax.device_put(arr, meshlib.batch_sharding(self.mesh))

    def round_batch(self, n: int) -> int:
        """Round a batch bucket up so it divides evenly over the data axis."""
        if getattr(self, "mesh", None) is None:
            return n
        d = self.mesh.shape[settings.MESH_DATA_AXIS]
        return -(-n // d) * d

    def pipeline_cap(self, setting_value, batch_size: int) -> int:
        """Rows/tiles per dispatch for pipelined predictors: the configured
        cap, else 8 on tpu (>= 2 dispatches per typical call so host prepare
        + H2D overlap device compute), else the full batch."""
        cap = setting_value
        if cap is None:
            cap = 8 if settings.DEVICE == "tpu" else batch_size
        return min(batch_size, max(1, cap))

    def bucket_rows(self, current: int, batch_size: int) -> int:
        """Row count for a (possibly partial) batch: the next power of two
        <= batch_size, mesh-aligned — a partial final batch must not pay the
        full batch's compute, at the cost of at most log2(batch_size)
        compiled programs."""
        rows = 1
        while rows < min(current, batch_size):
            rows *= 2
        return max(self.round_batch(rows), current)

    @staticmethod
    def gray_ship(pixels: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] uint8 -> [B, H, W, 1] when every pixel has R==G==B
        (the common case for documents): 3x fewer H2D bytes on a tunnel-
        attached chip; the device program tiles the channel back, giving
        bit-identical compute. A strided sample gates the full compare so
        color batches pay ~nothing."""
        if pixels.ndim != 4 or pixels.shape[-1] != 3:
            return pixels
        s = pixels[:, ::16, ::16]
        if not ((s[..., 0] == s[..., 1]).all() and (s[..., 1] == s[..., 2]).all()):
            return pixels
        if not (
            (pixels[..., 0] == pixels[..., 1]).all()
            and (pixels[..., 1] == pixels[..., 2]).all()
        ):
            return pixels
        return np.ascontiguousarray(pixels[..., :1])

    @staticmethod
    def pad_to_batch_size(arr: np.ndarray, batch_size: int) -> np.ndarray:
        """Pad axis 0 up to batch_size by repeating the last row — keeps
        device shapes static across calls (XLA compiles once)."""
        current = arr.shape[0]
        if current >= batch_size:
            return arr
        pad = [(0, batch_size - current)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad, mode="edge")

    def __call__(self, *args, **kwargs):
        raise NotImplementedError
