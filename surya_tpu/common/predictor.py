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

    def __init__(self, checkpoint: Optional[str] = None):
        self.disable_tqdm = settings.DISABLE_TQDM
        self._load(checkpoint)

    def _load(self, checkpoint: Optional[str]):
        raise NotImplementedError

    def get_batch_size(self) -> int:
        if self.batch_size is not None:
            return self.batch_size
        return self.default_batch_sizes[settings.DEVICE]

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
