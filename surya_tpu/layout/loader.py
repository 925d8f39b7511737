"""Layout model loading (reference: surya/layout/loader.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from surya_tpu.common.runtime import setup_jax
from surya_tpu.common.s3 import resolve_checkpoint
from surya_tpu.common.weights import load_config_json, load_safetensors_dir
from surya_tpu.common.checkpoint import load_or_convert
from surya_tpu.logging import get_logger
from surya_tpu.models import adetr, donut_swin, layout_model
from surya_tpu.settings import settings

logger = get_logger()


def _configs_from_json(raw: dict) -> layout_model.LayoutConfig:
    enc_raw = raw.get("encoder", {})
    dec_raw = raw.get("decoder", {})
    enc = donut_swin.DonutSwinConfig(
        image_size=tuple(enc_raw.get("image_size", (768, 768))),
        patch_size=enc_raw.get("patch_size", 4),
        embed_dim=enc_raw.get("embed_dim", 128),
        depths=tuple(enc_raw.get("depths", (2, 2, 16, 2))),
        num_heads=tuple(enc_raw.get("num_heads", (4, 8, 16, 32))),
        num_kv_heads=tuple(enc_raw.get("num_kv_heads", (4, 8, 16, 32))),
        window_size=enc_raw.get("window_size", 8),
        encoder_length=enc_raw.get("encoder_length", 768),
        use_positional_embeddings=enc_raw.get("use_positional_embeddings", True),
    )
    n_layers = dec_raw.get("num_hidden_layers", 8)
    dec = adetr.ADETRConfig(
        num_hidden_layers=n_layers,
        hidden_size=dec_raw.get("hidden_size", 1024),
        intermediate_size=dec_raw.get("intermediate_size", 4096),
        encoder_hidden_size=dec_raw.get("encoder_hidden_size", 1024),
        num_attention_heads=dec_raw.get("num_attention_heads", 16),
        num_key_value_heads=dec_raw.get("num_key_value_heads", 4),
        rope_theta=dec_raw.get("rope_theta", 10000.0),
        rms_norm_eps=dec_raw.get("rms_norm_eps", 1e-6),
        cross_attn_layers=tuple(dec_raw.get("cross_attn_layers", range(n_layers))),
        self_attn_layers=tuple(dec_raw.get("self_attn_layers", range(n_layers))),
    )
    return layout_model.LayoutConfig(
        vocab_size=dec_raw.get("vocab_size", 1025),
        bbox_size=dec_raw.get("bbox_size", 1024),
        skew_scaler=dec_raw.get("skew_scaler", 512),
        label_count=dec_raw.get("label_count", layout_model.LayoutConfig.label_count),
        max_boxes=settings.LAYOUT_MAX_BOXES,
        encoder=enc,
        decoder=dec,
    )


def load_layout_model(checkpoint: Optional[str] = None, tiny: bool = False) -> Tuple[dict, layout_model.LayoutConfig]:
    setup_jax()
    name = checkpoint or settings.LAYOUT_MODEL_CHECKPOINT
    ckpt_dir = resolve_checkpoint(name)
    dtype = settings.MODEL_DTYPE

    if ckpt_dir is not None:
        config = _configs_from_json(load_config_json(ckpt_dir))
        params = load_or_convert(
            ckpt_dir, "layout",
            lambda: layout_model.convert_torch(load_safetensors_dir(ckpt_dir), config, dtype=dtype),
        )
        logger.info("loaded layout checkpoint from %s", ckpt_dir)
        return params, config

    if not settings.ALLOW_RANDOM_WEIGHTS:
        raise FileNotFoundError(
            f"layout checkpoint {name!r} not found locally and not downloadable; "
            "set ALLOW_RANDOM_WEIGHTS=true for random init (tests/benches only)"
        )
    logger.warning("layout: random-init weights (no checkpoint reachable)")

    if tiny:
        enc = donut_swin.DonutSwinConfig(
            image_size=(128, 128), embed_dim=16, depths=(1, 1), num_heads=(2, 4),
            num_kv_heads=(2, 4), encoder_length=1024,
        )
        dec = adetr.ADETRConfig(
            num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            encoder_hidden_size=enc.hidden_size, num_attention_heads=4, num_key_value_heads=2,
            cross_attn_layers=(0, 1), self_attn_layers=(0, 1),
        )
        config = layout_model.LayoutConfig(max_boxes=settings.LAYOUT_MAX_BOXES, encoder=enc, decoder=dec)
    else:
        config = layout_model.LayoutConfig(max_boxes=settings.LAYOUT_MAX_BOXES)
    params = layout_model.init_params(config, jax.random.PRNGKey(settings.WEIGHT_SEED), dtype=dtype)
    return params, config
