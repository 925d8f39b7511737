"""Checkpoint loading: torch safetensors → JAX parameter pytrees.

The reference distributes HF safetensors checkpoints via an S3 manifest
(surya/common/s3.py:68-105). This module loads those checkpoints from a local
directory (downloaded by surya_tpu.common.s3) and remaps torch tensors into
the functional pytrees used by surya_tpu.models.*:

  - torch Conv2d OIHW → HWIO
  - torch Linear [out, in] → [in, out]
  - torch BatchNorm2d (weight, bias, running_mean, running_var) → folded
    inference scale/bias (surya_tpu.nn.fold_batchnorm)
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from surya_tpu.logging import get_logger

logger = get_logger()


def load_safetensors_dir(ckpt_dir: str) -> Dict[str, np.ndarray]:
    """Read every *.safetensors file in a checkpoint directory into one flat
    {torch_key: np.ndarray} dict."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {ckpt_dir}")
    for fname in files:
        with safe_open(os.path.join(ckpt_dir, fname), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def load_config_json(ckpt_dir: str) -> dict:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return json.load(f)


def from_torch_state_dict(state_dict) -> Dict[str, np.ndarray]:
    """Convert an in-memory torch state dict to {key: np.ndarray} (fp32)."""
    return {k: np.asarray(v.detach().to("cpu").float().numpy()) for k, v in state_dict.items()}


class TensorBag:
    """Flat tensor dict with typed accessors doing the torch→JAX layout
    remaps, tracking which keys were consumed so converters can assert full
    coverage of a checkpoint."""

    def __init__(self, tensors: Dict[str, np.ndarray], dtype=jnp.float32):
        self.tensors = tensors
        self.dtype = dtype
        self.used: set = set()

    def _take(self, key: str) -> np.ndarray:
        if key not in self.tensors:
            raise KeyError(f"checkpoint missing tensor {key!r}")
        self.used.add(key)
        return self.tensors[key]

    def raw(self, key: str, dtype=None) -> jnp.ndarray:
        return jnp.asarray(self._take(key), dtype or self.dtype)

    def conv(self, prefix: str, bias: bool | None = None) -> dict:
        w = self._take(f"{prefix}.weight")
        p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), self.dtype)}
        if bias is None:
            bias = f"{prefix}.bias" in self.tensors
        if bias:
            p["bias"] = self.raw(f"{prefix}.bias")
        return p

    def linear(self, prefix: str, bias: bool | None = None) -> dict:
        w = self._take(f"{prefix}.weight")
        p = {"kernel": jnp.asarray(w.T, self.dtype)}
        if bias is None:
            bias = f"{prefix}.bias" in self.tensors
        if bias:
            p["bias"] = self.raw(f"{prefix}.bias")
        return p

    def batchnorm(self, prefix: str, eps: float = 1e-5) -> dict:
        from surya_tpu import nn

        folded = nn.fold_batchnorm(
            jnp.asarray(self._take(f"{prefix}.weight"), jnp.float32),
            jnp.asarray(self._take(f"{prefix}.bias"), jnp.float32),
            jnp.asarray(self._take(f"{prefix}.running_mean"), jnp.float32),
            jnp.asarray(self._take(f"{prefix}.running_var"), jnp.float32),
            eps=eps,
        )
        self.used.add(f"{prefix}.num_batches_tracked")
        return {k: v.astype(self.dtype) for k, v in folded.items()}

    def layernorm(self, prefix: str) -> dict:
        return {"scale": self.raw(f"{prefix}.weight"), "bias": self.raw(f"{prefix}.bias")}

    def rmsnorm(self, prefix: str) -> dict:
        return {"scale": self.raw(f"{prefix}.weight")}

    def embedding(self, prefix: str) -> dict:
        return {"embedding": self.raw(f"{prefix}.weight")}

    def warn_unused(self, context: str = ""):
        unused = set(self.tensors) - self.used
        unused = {k for k in unused if not k.endswith("num_batches_tracked")}
        if unused:
            logger.warning("%s: %d checkpoint tensors unused, e.g. %s", context, len(unused), sorted(unused)[:5])
