"""Text-line detection predictor.

Pipeline (reference: surya/detection/__init__.py:22-155, redesigned TPU-first):
  1. split tall pages into vertical chunks (util.split_image)
  2. double-LANCZOS resize each chunk to processor size on host, keep uint8
  3. one jitted device program: uint8→float rescale, ImageNet normalize,
     EfficientViT forward, sigmoid, bilinear upsample — static batch shape
  4. host: CRAFT connected-component box extraction in a thread pool
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Generator, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import tqdm

from surya_tpu.common.predictor import BasePredictor
from surya_tpu.detection.heatmap import parallel_get_boxes
from surya_tpu.detection.loader import load_detection_model
from surya_tpu.detection.parallel import FakeExecutor
from surya_tpu.detection.schema import TextDetectionResult
from surya_tpu.detection.util import get_total_splits, split_image
from surya_tpu.models import efficientvit
from surya_tpu.settings import settings


class DetectionPredictor(BasePredictor):
    batch_size = settings.DETECTOR_BATCH_SIZE
    default_batch_sizes = {"cpu": 8, "tpu": 36}

    def _load(self, checkpoint: Optional[str]):
        self.params, self.config = load_detection_model(checkpoint)
        self.processor_size = self.config.image_size  # (h, w)

        @partial(jax.jit, static_argnames=())
        def forward(params, pixels_u8):
            x = pixels_u8.astype(settings.MODEL_DTYPE) / 255.0
            # compact uint8 heatmap at 1/4 res: D2H transfer is the detection
            # bottleneck; upsampling happens on host (see apply_compact)
            return efficientvit.apply_compact(params, self.config, x)

        self._forward = forward

    def __call__(
        self, images: List[Image.Image], batch_size=None, include_maps=False
    ) -> List[TextDetectionResult]:
        generator = self.batch_detection(images, batch_size=batch_size)

        futures = []
        max_workers = max(1, min(settings.DETECTOR_POSTPROCESSING_CPU_WORKERS, len(images)))
        parallelize = len(images) >= settings.DETECTOR_MIN_PARALLEL_THRESH
        executor = ThreadPoolExecutor if parallelize else FakeExecutor
        with executor(max_workers=max_workers) as e:
            for preds, orig_sizes in generator:
                for pred, orig_size in zip(preds, orig_sizes):
                    futures.append(e.submit(parallel_get_boxes, pred, orig_size, include_maps))

        return [f.result() for f in futures]

    def prepare_image(self, img: Image.Image) -> np.ndarray:
        """Double-LANCZOS resize to processor size (the reference notes the
        double resize matters for accuracy: surya/detection/__init__.py:50-62).
        Returns HWC uint8 — normalization happens on device."""
        new_size = (self.processor_size[1], self.processor_size[0])  # (w, h)
        img.thumbnail(new_size, Image.Resampling.LANCZOS)
        img = img.resize(new_size, Image.Resampling.LANCZOS)
        return np.asarray(img, dtype=np.uint8)

    def batch_detection(
        self, images: List[Image.Image], batch_size=None
    ) -> Generator[Tuple[List[List[np.ndarray]], List[Tuple[int, int]]], None, None]:
        assert all(isinstance(image, Image.Image) for image in images)
        if batch_size is None:
            batch_size = self.get_batch_size()
        proc_h = self.processor_size[0]

        orig_sizes = [image.size for image in images]
        splits_per_image = [get_total_splits(size, proc_h) for size in orig_sizes]

        # pack images into batches by their split counts
        batches: List[List[int]] = []
        current: List[int] = []
        current_size = 0
        for i in range(len(images)):
            if current_size + splits_per_image[i] > batch_size:
                if current:
                    batches.append(current)
                current, current_size = [], 0
            current.append(i)
            current_size += splits_per_image[i]
        if current:
            batches.append(current)

        for batch_idxs in tqdm(
            range(len(batches)), desc="Detecting bboxes", disable=self.disable_tqdm
        ):
            batch_image_idxs = batches[batch_idxs]
            batch_images = [images[j].convert("RGB") for j in batch_image_idxs]

            split_index: List[int] = []
            split_heights: List[int] = []
            image_splits: List[Image.Image] = []
            for image_idx, image in enumerate(batch_images):
                parts, heights = split_image(image, proc_h)
                image_splits.extend(parts)
                split_index.extend([image_idx] * len(parts))
                split_heights.extend(heights)

            if len(image_splits) >= settings.DETECTOR_MIN_PARALLEL_THRESH:
                with ThreadPoolExecutor(max_workers=settings.DETECTOR_POSTPROCESSING_CPU_WORKERS) as pool:
                    prepared = list(pool.map(self.prepare_image, image_splits))
            else:
                prepared = [self.prepare_image(part) for part in image_splits]
            pixels = np.stack(prepared, axis=0)
            n_real = pixels.shape[0]
            # bucket to the next power of two (≤ batch_size): static shapes for
            # XLA with at most log2(batch_size) compiled programs
            bucket = 1
            while bucket < min(n_real, batch_size):
                bucket *= 2
            pixels = self.pad_to_batch_size(pixels, min(max(bucket, n_real), max(batch_size, n_real)))

            out = self._forward(self.params, jnp.asarray(pixels))
            compact = np.asarray(jax.device_get(out[:n_real]))

            preds: List[List[np.ndarray]] = []
            n_maps = self.config.num_classes
            out_wh = (self.processor_size[1], self.processor_size[0])
            for i, (idx, height) in enumerate(zip(split_index, split_heights)):
                # host-side bilinear upsample of the quantized 1/4-res map
                full = cv2.resize(compact[i], out_wh, interpolation=cv2.INTER_LINEAR)
                full = full.astype(np.float32) / 255.0
                maps = [full[:, :, k] for k in range(n_maps)]
                if len(preds) <= idx:
                    preds.append(maps)
                else:
                    if height < proc_h:
                        maps = [m[:height, :] for m in maps]
                    preds[idx] = [np.vstack([old, new]) for old, new in zip(preds[idx], maps)]

            yield preds, [orig_sizes[j] for j in batch_image_idxs]
