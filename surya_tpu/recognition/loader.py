"""Recognition foundation-model loading (reference: surya/recognition/loader.py).

With a checkpoint directory: builds configs from config.json, the Qwen2 math
tokenizer from the checkpoint's tokenizer files, and converts the torch
safetensors. Offline: random weights (gated by ALLOW_RANDOM_WEIGHTS) with a
byte-level math tokenizer and the default special-token list — same id
arithmetic, different offsets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from surya_tpu.common.runtime import setup_jax
from surya_tpu.common.s3 import resolve_checkpoint
from surya_tpu.common.weights import load_config_json, load_safetensors_dir
from surya_tpu.common.checkpoint import load_or_convert
from surya_tpu.logging import get_logger
from surya_tpu.models import foundation, qwen_decoder, qwen_encoder
from surya_tpu.recognition.processor import RecognitionProcessor
from surya_tpu.recognition.tokenizer import (
    ByteFallbackMathTokenizer,
    OCRTokenizer,
    QwenMathTokenizer,
)
from surya_tpu.settings import settings

logger = get_logger()

# Plausible production-scale defaults for offline random-init mode; a real
# checkpoint's config.json always overrides these.
DEFAULT_DECODER = dict(
    hidden_size=1536, intermediate_size=4096, num_hidden_layers=10,
    num_attention_heads=12, num_key_value_heads=4, rope_theta=10000.0,
)
DEFAULT_ENCODER = dict(
    depth=8, hidden_size=1280, intermediate_size=3420, num_heads=16,
    window_size=112, out_hidden_size=1536, fullatt_block_indexes=(3, 7),
)


def load_recognition_model(
    checkpoint: Optional[str] = None,
    tiny: bool = False,
) -> Tuple[dict, foundation.FoundationConfig, RecognitionProcessor]:
    setup_jax()
    name = checkpoint or settings.RECOGNITION_MODEL_CHECKPOINT
    ckpt_dir = resolve_checkpoint(name)
    dtype = settings.MODEL_DTYPE

    if ckpt_dir is not None:
        raw = load_config_json(ckpt_dir)
        enc_raw = raw.get("vision_encoder", {})
        dec_raw = raw.get("decoder", {})
        enc = qwen_encoder.EncoderConfig(
            depth=enc_raw.get("depth", 8),
            hidden_size=enc_raw.get("hidden_size", 1280),
            intermediate_size=enc_raw.get("intermediate_size", 3420),
            num_heads=enc_raw.get("num_heads", 16),
            patch_size=enc_raw.get("patch_size", 14),
            spatial_merge_size=enc_raw.get("spatial_merge_size", 2),
            temporal_patch_size=enc_raw.get("temporal_patch_size", 1),
            window_size=enc_raw.get("window_size", 112),
            out_hidden_size=enc_raw.get("out_hidden_size", 1280),
            fullatt_block_indexes=tuple(enc_raw.get("fullatt_block_indexes", (3, 7))),
        )
        dec = qwen_decoder.DecoderConfig(
            vocab_size=raw["vocab_size"],
            hidden_size=dec_raw.get("hidden_size", 1536),
            intermediate_size=dec_raw.get("intermediate_size", 4096),
            num_hidden_layers=dec_raw.get("num_hidden_layers", 10),
            num_attention_heads=dec_raw.get("num_attention_heads", 12),
            num_key_value_heads=dec_raw.get("num_key_value_heads", 4),
            rope_theta=dec_raw.get("rope_theta", 10000.0),
            rms_norm_eps=dec_raw.get("rms_norm_eps", 1e-6),
        )
        tokenizer = OCRTokenizer(
            special_tokens=raw.get("special_ocr_tokens"),
            math_tokenizer=QwenMathTokenizer(ckpt_dir),
        )
        config = foundation.FoundationConfig(
            vocab_size=raw["vocab_size"],
            bbox_size=raw.get("bbox_size", 1025),
            bos_token_id=raw.get("bos_token_id", 0),
            eos_token_id=raw.get("eos_token_id", 1),
            pad_token_id=raw.get("pad_token_id", 2),
            image_token_id=raw.get("image_token_id", 3),
            max_sequence_length=raw.get("max_sequence_length", 1536),
            num_register_tokens=raw.get("num_register_tokens", 4),
            image_embed_encoding_size=raw.get("image_embed_encoding_size", 1024),
            image_embed_encoding_multiplier=raw.get("image_embed_encoding_multiplier", 256),
            encoder=enc,
            decoder=dec,
        )
        params = load_or_convert(
            ckpt_dir, "recognition",
            lambda: foundation.convert_torch(load_safetensors_dir(ckpt_dir), config, dtype=dtype),
        )
        if settings.RECOGNITION_WEIGHT_QUANTIZE:
            params["decoder"] = qwen_decoder.quantize_weights(params["decoder"])
        processor = RecognitionProcessor(
            tokenizer,
            patch_size=enc.patch_size,
            merge_size=enc.spatial_merge_size,
            num_register_tokens=config.num_register_tokens,
        )
        logger.info("loaded recognition checkpoint from %s", ckpt_dir)
        return params, config, processor

    if not settings.ALLOW_RANDOM_WEIGHTS:
        raise FileNotFoundError(
            f"recognition checkpoint {name!r} not found locally and not downloadable; "
            "set ALLOW_RANDOM_WEIGHTS=true for random init (tests/benches only)"
        )
    logger.warning("recognition: random-init weights (no checkpoint reachable)")

    tokenizer = OCRTokenizer(math_tokenizer=ByteFallbackMathTokenizer())
    if tiny:
        enc = qwen_encoder.EncoderConfig(
            depth=2, hidden_size=64, intermediate_size=128, num_heads=4,
            window_size=56, out_hidden_size=96, fullatt_block_indexes=(1,),
        )
        dec = qwen_decoder.DecoderConfig(
            vocab_size=tokenizer.vocab_size, hidden_size=96, intermediate_size=192,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        )
    else:
        enc = qwen_encoder.EncoderConfig(**DEFAULT_ENCODER)
        dec = qwen_decoder.DecoderConfig(vocab_size=tokenizer.vocab_size, **DEFAULT_DECODER)

    st = tokenizer.system_tokens
    config = foundation.FoundationConfig(
        vocab_size=tokenizer.vocab_size,
        eos_token_id=st["</S>"],
        pad_token_id=st["<PAD>"],
        image_token_id=st["<IMAGE>"],
        encoder=enc,
        decoder=dec,
    )
    params = foundation.init_params(config, jax.random.PRNGKey(settings.WEIGHT_SEED), dtype=dtype)
    if settings.RECOGNITION_WEIGHT_QUANTIZE:
        params["decoder"] = qwen_decoder.quantize_weights(params["decoder"])
    processor = RecognitionProcessor(
        tokenizer,
        patch_size=enc.patch_size,
        merge_size=enc.spatial_merge_size,
        num_register_tokens=config.num_register_tokens,
    )
    return params, config, processor
