"""Table-rec model loading (reference: surya/table_rec/loader.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from surya_tpu.common.runtime import setup_jax
from surya_tpu.common.s3 import resolve_checkpoint
from surya_tpu.common.weights import load_config_json, load_safetensors_dir
from surya_tpu.common.checkpoint import load_or_convert
from surya_tpu.logging import get_logger
from surya_tpu.models import adetr, donut_swin, table_rec_model
from surya_tpu.settings import settings

logger = get_logger()


def load_table_rec_model(checkpoint: Optional[str] = None, tiny: bool = False) -> Tuple[dict, table_rec_model.TableRecConfig]:
    setup_jax()
    name = checkpoint or settings.TABLE_REC_MODEL_CHECKPOINT
    ckpt_dir = resolve_checkpoint(name)
    dtype = settings.MODEL_DTYPE

    if ckpt_dir is not None:
        raw = load_config_json(ckpt_dir)
        enc_raw = raw.get("encoder", {})
        dec_raw = raw.get("decoder", {})
        enc = donut_swin.DonutSwinConfig(
            image_size=tuple(enc_raw.get("image_size", (768, 768))),
            embed_dim=enc_raw.get("embed_dim", 128),
            depths=tuple(enc_raw.get("depths", (2, 2, 12, 2))),
            num_heads=tuple(enc_raw.get("num_heads", (4, 8, 16, 32))),
            num_kv_heads=tuple(enc_raw.get("num_kv_heads", (4, 8, 16, 32))),
            window_size=enc_raw.get("window_size", 8),
            encoder_length=enc_raw.get("encoder_length", 1024),
            use_positional_embeddings=enc_raw.get("use_positional_embeddings", True),
        )
        n_layers = dec_raw.get("num_hidden_layers", 6)
        dec = adetr.ADETRConfig(
            num_hidden_layers=n_layers,
            hidden_size=dec_raw.get("hidden_size", 512),
            intermediate_size=dec_raw.get("intermediate_size", 2048),
            encoder_hidden_size=dec_raw.get("encoder_hidden_size", 1024),
            num_attention_heads=dec_raw.get("num_attention_heads", 8),
            num_key_value_heads=dec_raw.get("num_key_value_heads", 4),
            rope_theta=dec_raw.get("rope_theta", 10000.0),
            double_residual_flow=False,
            cross_attn_layers=tuple(dec_raw.get("cross_attn_layers", range(n_layers))),
            self_attn_layers=tuple(dec_raw.get("self_attn_layers", range(n_layers))),
        )
        config = table_rec_model.TableRecConfig(
            property_embed_size=dec_raw.get("property_embed_size", 64),
            box_embed_size=dec_raw.get("box_embed_size", 448),
            max_boxes=settings.TABLE_REC_MAX_BOXES,
            encoder=enc,
            decoder=dec,
        )
        params = load_or_convert(
            ckpt_dir, "table_rec",
            lambda: table_rec_model.convert_torch(load_safetensors_dir(ckpt_dir), config, dtype=dtype),
        )
        logger.info("loaded table_rec checkpoint from %s", ckpt_dir)
        return params, config

    if not settings.ALLOW_RANDOM_WEIGHTS:
        raise FileNotFoundError(
            f"table_rec checkpoint {name!r} not found locally and not downloadable; "
            "set ALLOW_RANDOM_WEIGHTS=true for random init (tests/benches only)"
        )
    logger.warning("table_rec: random-init weights (no checkpoint reachable)")

    if tiny:
        enc = donut_swin.DonutSwinConfig(
            image_size=(128, 128), embed_dim=16, depths=(1, 1), num_heads=(2, 4),
            num_kv_heads=(2, 4), encoder_length=1024,
        )
        dec = adetr.ADETRConfig(
            num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            encoder_hidden_size=enc.hidden_size, num_attention_heads=4, num_key_value_heads=2,
            double_residual_flow=False, cross_attn_layers=(0, 1), self_attn_layers=(0, 1),
        )
        config = table_rec_model.TableRecConfig(
            box_embed_size=24, property_embed_size=8, max_boxes=settings.TABLE_REC_MAX_BOXES,
            encoder=enc, decoder=dec,
        )
    else:
        config = table_rec_model.TableRecConfig(max_boxes=settings.TABLE_REC_MAX_BOXES)
    params = table_rec_model.init_params(config, jax.random.PRNGKey(settings.WEIGHT_SEED), dtype=dtype)
    return params, config
