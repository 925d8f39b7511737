"""OCR error detection: DistilBERT binary text classifier
(reference: surya/ocr_error/__init__.py:14-63)."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import numpy as np
from tqdm import tqdm

from surya_tpu.common.predictor import BasePredictor
from surya_tpu.common.runtime import setup_jax
from surya_tpu.common.s3 import resolve_checkpoint
from surya_tpu.common.weights import load_config_json, load_safetensors_dir
from surya_tpu.common.checkpoint import load_or_convert
from surya_tpu.logging import get_logger
from surya_tpu.models import distilbert
from surya_tpu.models.distilbert import ID2LABEL
from surya_tpu.ocr_error.schema import OCRErrorDetectionResult
from surya_tpu.ocr_error.tokenizer import WordPieceTokenizer
from surya_tpu.settings import settings

logger = get_logger()

SEQ_BUCKETS = (64, 128, 256, 512)


def load_ocr_error_model(checkpoint: Optional[str] = None, tiny: bool = False) -> Tuple[dict, distilbert.DistilBertConfig, WordPieceTokenizer]:
    setup_jax()
    name = checkpoint or settings.OCR_ERROR_MODEL_CHECKPOINT
    ckpt_dir = resolve_checkpoint(name)
    dtype = settings.MODEL_DTYPE

    if ckpt_dir is not None:
        raw = load_config_json(ckpt_dir)
        config = distilbert.DistilBertConfig(
            vocab_size=raw.get("vocab_size", 30522),
            max_position_embeddings=raw.get("max_position_embeddings", 512),
            n_layers=raw.get("n_layers", 6),
            n_heads=raw.get("n_heads", 12),
            dim=raw.get("dim", 768),
            hidden_dim=raw.get("hidden_dim", 3072),
        )
        params = load_or_convert(
            ckpt_dir, "ocr_error",
            lambda: distilbert.convert_torch(load_safetensors_dir(ckpt_dir), config, dtype=dtype),
        )
        tokenizer = WordPieceTokenizer.from_pretrained(ckpt_dir)
        logger.info("loaded ocr_error checkpoint from %s", ckpt_dir)
        return params, config, tokenizer

    if not settings.ALLOW_RANDOM_WEIGHTS:
        raise FileNotFoundError(
            f"ocr_error checkpoint {name!r} not found locally and not downloadable; "
            "set ALLOW_RANDOM_WEIGHTS=true for random init (tests/benches only)"
        )
    logger.warning("ocr_error: random-init weights (no checkpoint reachable)")
    config = (
        distilbert.DistilBertConfig(n_layers=2, n_heads=4, dim=64, hidden_dim=128)
        if tiny
        else distilbert.DistilBertConfig()
    )
    params = distilbert.init_params(config, jax.random.PRNGKey(settings.WEIGHT_SEED), dtype=dtype)
    return params, config, WordPieceTokenizer()


class OCRErrorPredictor(BasePredictor):
    batch_size = settings.OCR_ERROR_BATCH_SIZE
    default_batch_sizes = {"cpu": 8, "tpu": 64}

    def __init__(self, checkpoint: Optional[str] = None, tiny: bool = False):
        self._tiny = tiny
        super().__init__(checkpoint)

    def _load(self, checkpoint: Optional[str]):
        self.params, self.config, self.processor = load_ocr_error_model(checkpoint, tiny=self._tiny)
        self.setup_mesh()  # dp: text batches shard over the data axis
        cfg = self.config

        @jax.jit
        def forward(params, input_ids, attention_mask):
            return distilbert.apply(params, cfg, input_ids, attention_mask)

        self._forward = forward

    def __call__(self, texts: List[str], batch_size: Optional[int] = None) -> OCRErrorDetectionResult:
        return self.batch_ocr_error_detection(texts, batch_size)

    def batch_ocr_error_detection(self, texts: List[str], batch_size: Optional[int] = None) -> OCRErrorDetectionResult:
        if batch_size is None:
            batch_size = self.get_batch_size()
        batch_size = self.round_batch(batch_size)

        encoded = self.processor(texts, max_length=self.config.max_position_embeddings)
        input_ids = encoded["input_ids"]
        attention_mask = encoded["attention_mask"]

        predictions: List[int] = []
        num_batches = math.ceil(len(texts) / batch_size)
        for batch_idx in tqdm(
            range(num_batches), desc="Running OCR Error Detection", disable=self.disable_tqdm
        ):
            lo, hi = batch_idx * batch_size, (batch_idx + 1) * batch_size
            ids = np.asarray(input_ids[lo:hi], np.int32)
            mask = np.asarray(attention_mask[lo:hi], np.int32)
            current = ids.shape[0]

            # static shapes: pad length to a bucket and rows to a power-of-
            # two bucket (partial final batches must not pay a full forward)
            L = next((b for b in SEQ_BUCKETS if b >= ids.shape[1]), SEQ_BUCKETS[-1])
            if ids.shape[1] < L:
                ids = np.pad(ids, ((0, 0), (0, L - ids.shape[1])))
                mask = np.pad(mask, ((0, 0), (0, L - mask.shape[1])))
            rows = self.bucket_rows(current, batch_size)
            ids = self.pad_to_batch_size(ids, rows)
            mask = self.pad_to_batch_size(mask, rows)

            logits = self._forward(self.params, self.shard_pixels(ids), self.shard_pixels(mask))
            predictions.extend(np.asarray(logits).argmax(axis=1)[:current].tolist())

        return OCRErrorDetectionResult(texts=texts, labels=[ID2LABEL[p] for p in predictions])
