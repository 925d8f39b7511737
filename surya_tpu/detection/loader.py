"""Detection model loading (reference: surya/detection/loader.py:16-51)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from surya_tpu.common.runtime import setup_jax
from surya_tpu.common.s3 import resolve_checkpoint
from surya_tpu.common.weights import load_config_json, load_safetensors_dir
from surya_tpu.common.checkpoint import load_or_convert
from surya_tpu.logging import get_logger
from surya_tpu.models import efficientvit
from surya_tpu.settings import settings

logger = get_logger()


def load_detection_model(
    checkpoint: Optional[str] = None,
    tiny: bool = False,
) -> Tuple[dict, efficientvit.EfficientViTConfig]:
    """Returns (params, config). Reads a local/downloaded safetensors
    checkpoint when reachable; falls back to random init if
    settings.ALLOW_RANDOM_WEIGHTS (tests/benches) — else raises."""
    setup_jax()
    name = checkpoint or settings.DETECTOR_MODEL_CHECKPOINT
    ckpt_dir = resolve_checkpoint(name)
    dtype = settings.MODEL_DTYPE

    if ckpt_dir is not None:
        raw_cfg = load_config_json(ckpt_dir)
        size_cfg = raw_cfg.get("image_size") or {}
        config = efficientvit.EfficientViTConfig(
            num_classes=raw_cfg.get("num_classes", 2),
            widths=tuple(raw_cfg.get("widths", (32, 64, 128, 256, 512))),
            head_dim=raw_cfg.get("head_dim", 32),
            depths=tuple(raw_cfg.get("depths", (1, 1, 1, 6, 6))),
            strides=tuple(raw_cfg.get("strides", (2, 2, 2, 2, 2))),
            layer_norm_eps=raw_cfg.get("layer_norm_eps", 1e-6),
            decoder_layer_hidden_size=raw_cfg.get("decoder_layer_hidden_size", 128),
            decoder_hidden_size=raw_cfg.get("decoder_hidden_size", 512),
            image_size=(size_cfg.get("height", 896), size_cfg.get("width", 896)),
        )
        params = load_or_convert(
            ckpt_dir, "detection",
            lambda: efficientvit.convert_torch(load_safetensors_dir(ckpt_dir), config, dtype=dtype),
        )
        logger.info("loaded detection checkpoint from %s", ckpt_dir)
        return params, config

    if not settings.ALLOW_RANDOM_WEIGHTS:
        raise FileNotFoundError(
            f"detection checkpoint {name!r} not found locally and not downloadable; "
            "set ALLOW_RANDOM_WEIGHTS=true for random init (tests/benches only)"
        )
    logger.warning("detection: random-init weights (no checkpoint reachable)")
    if tiny:
        # same stage/stride structure and processor size as production (the
        # chunking/stitch/postprocess mechanics depend on those), tiny widths
        config = efficientvit.EfficientViTConfig(
            widths=(8, 8, 16, 16, 32), depths=(1, 1, 1, 1, 1),
            head_dim=8, decoder_layer_hidden_size=16, decoder_hidden_size=32,
        )
    else:
        config = efficientvit.EfficientViTConfig()
    params = efficientvit.init_params(config, jax.random.PRNGKey(settings.WEIGHT_SEED), dtype=dtype)
    return params, config
