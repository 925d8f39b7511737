"""Layout analysis + reading order predictor.

Pipeline (reference: surya/layout/__init__.py:18-226, TPU re-design):
  1. slice oversized pages into ≤4 tiles (slicer)
  2. squish-resize to 768x768, normalize on device
  3. ONE jitted program: Swin encode + full autoregressive box decode with
     the header/footer rewrite in-graph (models/layout_model.generate)
  4. host: top-k label probs, schema assembly, tile rejoin

Reading order = emission order (`position`).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import tqdm

from surya_tpu.common.predictor import BasePredictor
from surya_tpu.common.util import clean_boxes
from surya_tpu.layout.loader import load_layout_model
from surya_tpu.layout.schema import LayoutBox, LayoutResult
from surya_tpu.layout.slicer import ImageSlicer
from surya_tpu.models.layout_model import ID_TO_LABEL
from surya_tpu.settings import settings

IMAGE_MEAN = 0.5
IMAGE_STD = 0.5


def prediction_to_polygon(pred, img_size, bbox_scaler, skew_scaler, skew_min=0.001):
    """Decode one (cx, cy, w, h, xskew, yskew) box into a skewed quad scaled
    to the page (reference: surya/layout/util.py:4-41)."""
    w_scale = img_size[0] / bbox_scaler
    h_scale = img_size[1] / bbox_scaler
    cx, cy, width, height = pred[0], pred[1], pred[2], pred[3]
    x1, y1 = cx - width / 2, cy - height / 2
    x2, y2 = cx + width / 2, cy + height / 2
    skew_x = float(np.floor((pred[4] - skew_scaler) / 2))
    skew_y = float(np.floor((pred[5] - skew_scaler) / 2))
    if abs(skew_x) < skew_min:
        skew_x = 0
    if abs(skew_y) < skew_min:
        skew_y = 0
    quad = [
        (x1 - skew_x, y1 - skew_y),
        (x2 - skew_x, y1 + skew_y),
        (x2 + skew_x, y2 + skew_y),
        (x1 + skew_x, y2 - skew_y),
    ]
    return [[float(x) * w_scale, float(y) * h_scale] for x, y in quad]


class LayoutPredictor(BasePredictor):
    batch_size = settings.LAYOUT_BATCH_SIZE
    default_batch_sizes = {"cpu": 4, "tpu": 16}

    def __init__(self, checkpoint: Optional[str] = None, tiny: bool = False):
        self._tiny = tiny
        super().__init__(checkpoint)

    def _load(self, checkpoint: Optional[str]):
        self.params, self.config = load_layout_model(checkpoint, tiny=self._tiny)
        self.setup_mesh()  # dp: tile batches shard over the data axis
        cfg = self.config
        from surya_tpu.models import layout_model

        @jax.jit
        def generate(params, pixels_u8):
            if pixels_u8.shape[-1] == 1:
                # grayscale ship: H2D is the dominant wall on a tunnel-
                # attached chip; R==G==B pages ship one channel (3x fewer
                # bytes) and are tiled back here — bit-identical compute
                pixels_u8 = jnp.concatenate([pixels_u8] * 3, axis=-1)
            x = pixels_u8.astype(settings.MODEL_DTYPE) / 255.0
            x = (x - IMAGE_MEAN) / IMAGE_STD
            boxes, logits, valid = layout_model.generate(params, cfg, x)
            # pack into one array: one device->host fetch per batch
            return jnp.concatenate(
                [boxes, logits, valid[..., None].astype(jnp.float32)], axis=-1
            )

        self._generate = generate

    def prepare_image(self, img: Image.Image) -> np.ndarray:
        """Squish-resize to the encoder size (reference donut processor
        resizes directly to max_size: common/donut/processor.py:51-59)."""
        import cv2

        size = self.config.encoder.image_size
        arr = np.asarray(img, dtype=np.uint8)
        return cv2.resize(arr, (size[1], size[0]), interpolation=cv2.INTER_LANCZOS4)

    def __call__(self, images: List[Image.Image], batch_size: Optional[int] = None, top_k: int = 5) -> List[LayoutResult]:
        return self.batch_layout_detection(images, batch_size=batch_size, top_k=top_k)

    def batch_layout_detection(self, images, batch_size=None, top_k: int = 5) -> List[LayoutResult]:
        assert all(isinstance(im, Image.Image) for im in images)
        if batch_size is None:
            batch_size = self.get_batch_size()
        batch_size = self.round_batch(batch_size)

        slicer = ImageSlicer(settings.LAYOUT_SLICE_MIN, settings.LAYOUT_SLICE_SIZE)
        img_counts = [slicer.slice_count(image) for image in images]

        # pipeline sub-batches: cap tiles per dispatch so a multi-page call
        # becomes >=2 dispatches and host prepare/H2D of batch k+1 overlap
        # device compute of batch k (the bucket ladder still spans batch_size
        # so shapes stay shared)
        eff_batch = self.pipeline_cap(settings.LAYOUT_PIPELINE_BATCH, batch_size)

        # pack page indices into batches by tile count (reference :52-67)
        batches = []
        start_idx, end_idx = 0, 1
        while end_idx < len(img_counts):
            if (
                sum(img_counts[start_idx:end_idx]) >= eff_batch
                or sum(img_counts[start_idx : end_idx + 1]) > eff_batch
            ):
                batches.append((start_idx, end_idx))
                start_idx = end_idx
            end_idx += 1
        if start_idx < len(img_counts):
            batches.append((start_idx, len(img_counts)))

        results = []

        def finish(out_dev, current, orig_sizes, tile_positions):
            packed = np.asarray(out_dev)[:current]
            boxes = packed[..., :7]
            logits = packed[..., 7:-1]
            valid = packed[..., -1] > 0.5
            results.extend(
                self._assemble_batch(boxes, logits, valid, orig_sizes, tile_positions, slicer, top_k)
            )

        # ONE dispatch stays in flight: batch k's result fetch + host assembly
        # happen only after batch k+1's prepare/H2D/dispatch are enqueued, so
        # host work overlaps device compute (same scheme as detection)
        inflight = None
        for start_idx, end_idx in tqdm(batches, desc="Recognizing layout", disable=self.disable_tqdm):
            batch_images = [im.convert("RGB") for im in images[start_idx:end_idx]]
            batch_images, tile_positions = slicer.slice(batch_images)
            current = len(batch_images)
            orig_sizes = [im.size for im in batch_images]

            pixels = np.stack([self.prepare_image(im) for im in batch_images])
            pixels = self.pad_to_batch_size(pixels, self.bucket_rows(current, batch_size))
            # grayscale pages ship one channel; the device tiles it back
            # (see generate above)
            pixels = self.gray_ship(pixels)

            out_dev = self._generate(self.params, self.shard_pixels(pixels))
            if inflight is not None:
                finish(*inflight)
            inflight = (out_dev, current, orig_sizes, tile_positions)
        if inflight is not None:
            finish(*inflight)

        assert len(results) == len(images)
        return results

    def _assemble_batch(self, boxes, logits, valid, orig_sizes, tile_positions, slicer, top_k):
        """Host assembly of one fetched batch into LayoutResults."""
        batch_results = []
        dec = self.config
        for j, orig_size in enumerate(orig_sizes):
            layout_boxes = []
            position = 0
            for i in range(boxes.shape[1]):
                if not valid[j, i]:
                    continue
                token = boxes[j, i]
                if token[6] <= dec.special_token_count:  # drop special/Blank
                    continue
                label_id = int(token[6]) - dec.special_token_count
                label = ID_TO_LABEL[label_id]
                probs = _softmax(logits[j, i])
                top_idx = np.argsort(probs)[::-1][:top_k]
                top_k_dict = {
                    ID_TO_LABEL.get(int(t) - dec.special_token_count): float(probs[t])
                    for t in top_idx
                    if int(t) - dec.special_token_count > 0
                }
                poly = prediction_to_polygon(token, orig_size, dec.bbox_size, dec.skew_scaler)
                layout_boxes.append(
                    LayoutBox(
                        polygon=poly,
                        label=label,
                        position=position,
                        top_k=top_k_dict,
                        confidence=top_k_dict.get(label, 0.0),
                    )
                )
                position += 1
            layout_boxes = clean_boxes(layout_boxes)
            batch_results.append(
                LayoutResult(bboxes=layout_boxes, image_bbox=[0, 0, orig_size[0], orig_size[1]])
            )

        assert len(batch_results) == len(tile_positions)
        return slicer.join(batch_results, tile_positions)


def _softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()
