"""First-party native (C++) host ops.

The reference's host hot loops run on third-party binaries (OpenCV for the
CRAFT postprocess — SURVEY.md §2.9); here they are first-party C++, built
lazily with the system compiler and loaded via ctypes. Falls back cleanly
(callers check `craft_ops() is not None`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from surya_tpu.logging import get_logger

logger = get_logger()

_SRC = Path(__file__).parent / "craft_ops.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _build_dir() -> Path:
    from platformdirs import user_cache_dir

    d = Path(user_cache_dir("surya_tpu")) / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    so_path = _build_dir() / "libcraft_ops.so"
    src_mtime = _SRC.stat().st_mtime
    if not so_path.exists() or so_path.stat().st_mtime < src_mtime:
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so_path)]
        logger.info("building native craft_ops: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so_path))
    lib.craft_extract_boxes.restype = ctypes.c_int
    lib.craft_extract_boxes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.craft_extract_boxes_u8.restype = ctypes.c_int
    lib.craft_extract_boxes_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    return lib


def craft_ops() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            try:
                _lib = _load()
            except Exception as e:
                logger.warning("native craft_ops unavailable (%s); falling back to OpenCV", e)
    return _lib


def extract_boxes(linemap: np.ndarray, text_threshold: float, low_text: float, max_boxes: int = 1024):
    """Native CRAFT box extraction. Accepts a float32 [0,1] or uint8
    (value*255) heatmap — thresholds and confidences are always in [0,1].
    Returns (quads [n, 4, 2], confidences [n])."""
    lib = craft_ops()
    assert lib is not None
    quads = np.zeros((max_boxes, 8), np.float32)
    confs = np.zeros((max_boxes,), np.float32)
    if linemap.dtype == np.uint8:
        linemap = np.ascontiguousarray(linemap)
        fn, ptr = lib.craft_extract_boxes_u8, ctypes.POINTER(ctypes.c_uint8)
    else:
        linemap = np.ascontiguousarray(linemap, np.float32)
        fn, ptr = lib.craft_extract_boxes, ctypes.POINTER(ctypes.c_float)
    h, w = linemap.shape
    n = fn(
        linemap.ctypes.data_as(ptr), h, w,
        ctypes.c_float(text_threshold), ctypes.c_float(low_text),
        quads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        confs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_boxes,
    )
    return quads[:n].reshape(n, 4, 2), confs[:n]
