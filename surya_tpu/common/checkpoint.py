"""Converted-checkpoint caching with orbax.

Torch safetensors → JAX pytree conversion (common/weights.py) runs once per
checkpoint; the result is stored as an orbax checkpoint next to the download
cache, so later loads skip torch-layout remapping entirely (and read in the
target dtype directly). This is the TPU side of the reference's
checkpoint/resume story (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional

from surya_tpu.logging import get_logger

logger = get_logger()

_FORMAT_VERSION = "v1"


def _cache_path(ckpt_dir: str, tag: str) -> Path:
    return Path(ckpt_dir) / f".jax_cache_{tag}_{_FORMAT_VERSION}"


def save_converted(params, ckpt_dir: str, tag: str):
    import orbax.checkpoint as ocp

    path = _cache_path(ckpt_dir, tag)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path.absolute(), params, force=True)
        logger.info("cached converted %s params at %s", tag, path)
    except Exception as e:
        logger.warning("could not cache converted params (%s)", e)


def load_converted(ckpt_dir: str, tag: str):
    """Returns the cached converted pytree or None."""
    import orbax.checkpoint as ocp

    path = _cache_path(ckpt_dir, tag)
    if not path.exists():
        return None
    try:
        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(path.absolute())
        logger.info("loaded converted %s params from cache %s", tag, path)
        return params
    except Exception as e:
        logger.warning("converted-param cache unreadable (%s); re-converting", e)
        return None


def load_or_convert(ckpt_dir: str, tag: str, convert: Callable[[], dict]) -> dict:
    params = load_converted(ckpt_dir, tag)
    if params is None:
        params = convert()
        save_converted(params, ckpt_dir, tag)
    return params
