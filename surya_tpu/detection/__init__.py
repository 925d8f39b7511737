"""Text-line detection predictor.

Pipeline (reference: surya/detection/__init__.py:22-155, redesigned TPU-first):
  1. split tall pages into vertical chunks (util.split_image)
  2. double-LANCZOS resize each chunk to processor size on host, keep uint8
  3. one jitted device program: uint8→float rescale, ImageNet normalize,
     EfficientViT forward, sigmoid, bilinear upsample — static batch shape
  4. host: CRAFT connected-component box extraction in a thread pool
"""

from __future__ import annotations

import os
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
from surya_tpu.common.profiling import stage
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

        # compact uint8 heatmap at 1/4 res: D2H transfer is the detection
        # bottleneck; upsampling happens on host (see apply_compact).
        # _apply_maps is the patchable graph tail (benches hook it).
        def apply_maps(params, x):
            return efficientvit.apply_compact(params, self.config, x)

        self._apply_maps = apply_maps

        @partial(jax.jit, static_argnames=())
        def forward(params, pixels_u8):
            x = pixels_u8.astype(settings.MODEL_DTYPE) / 255.0
            return self._apply_maps(params, x)

        self._forward = forward

        @partial(jax.jit, static_argnames=())
        def forward_resize(params, pixels_u8, Vs, Hs, gid):
            """Fused double-LANCZOS resize + forward: chunks arrive at source
            resolution (uint8), the PIL-exact per-size weight matrices resize
            them on the MXU (resize.py), so the single-core host never touches
            full-page pixels beyond one memcpy."""
            V = Vs[gid].astype(settings.MODEL_DTYPE)
            Hm = Hs[gid].astype(settings.MODEL_DTYPE)
            x = pixels_u8.astype(settings.MODEL_DTYPE)
            x = jnp.einsum("boh,bhwc->bowc", V, x, preferred_element_type=jnp.float32)
            x = jnp.einsum(
                "bpw,bowc->bopc", Hm, x.astype(settings.MODEL_DTYPE),
                preferred_element_type=jnp.float32,
            )
            # PIL rounds to uint8 after the final resize
            x = jnp.clip(jnp.round(x), 0.0, 255.0)
            x = x.astype(settings.MODEL_DTYPE) / 255.0
            return self._apply_maps(params, x)

        self._forward_resize = forward_resize

    def __call__(
        self, images: List[Image.Image], batch_size=None, include_maps=False
    ) -> List[TextDetectionResult]:
        generator = self.batch_detection(images, batch_size=batch_size, include_maps=include_maps)

        futures = []
        max_workers = max(1, min(settings.DETECTOR_POSTPROCESSING_CPU_WORKERS, len(images)))
        parallelize = len(images) >= settings.DETECTOR_MIN_PARALLEL_THRESH
        executor = ThreadPoolExecutor if parallelize else FakeExecutor
        with executor(max_workers=max_workers) as e:
            for preds, orig_sizes in generator:
                for pred, orig_size in zip(preds, orig_sizes):
                    futures.append(e.submit(parallel_get_boxes, pred, orig_size, include_maps))

            with stage("detection.postprocess_wait"):
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
        self, images: List[Image.Image], batch_size=None, include_maps=False
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

            n_real = len(image_splits)
            # bucket to the next power of two (≤ batch_size): static shapes for
            # XLA with at most log2(batch_size) compiled programs
            bucket = 1
            while bucket < min(n_real, batch_size):
                bucket *= 2
            rows = min(max(bucket, n_real), max(batch_size, n_real))

            device_resize = settings.DETECTOR_DEVICE_RESIZE
            if device_resize is None:
                device_resize = settings.DEVICE == "tpu"

            if device_resize:
                # ship source-resolution uint8 chunks; the double-LANCZOS
                # resize runs on the MXU via per-size weight matrices
                # (resize.py) — host work is one memcpy per chunk
                from surya_tpu.detection.resize import double_resize_matrices

                with stage("detection.prepare"):
                    raw = [np.asarray(part, np.uint8) for part in image_splits]
                    sizes = [r.shape[:2] for r in raw]
                    Hb = -(-max(s[0] for s in sizes) // 128) * 128
                    Wb = -(-max(s[1] for s in sizes) // 128) * 128
                    pixels = np.zeros((rows, Hb, Wb, 3), np.uint8)
                    for i, r in enumerate(raw):
                        pixels[i, : r.shape[0], : r.shape[1]] = r
                    uniq = sorted(set(sizes))
                    n_groups = 1
                    while n_groups < len(uniq):
                        n_groups *= 2
                    Vs = np.zeros((n_groups, self.processor_size[0], Hb), np.float32)
                    Hs = np.zeros((n_groups, self.processor_size[1], Wb), np.float32)
                    for g, (h_src, w_src) in enumerate(uniq):
                        V, Hm = double_resize_matrices((h_src, w_src), tuple(self.processor_size))
                        Vs[g, :, :h_src] = V
                        Hs[g, :, :w_src] = Hm
                    gid = np.zeros(rows, np.int32)
                    gid[:n_real] = [uniq.index(s) for s in sizes]
            else:
                with stage("detection.prepare"):
                    if len(image_splits) >= settings.DETECTOR_MIN_PARALLEL_THRESH and (os.cpu_count() or 1) > 1:
                        with ThreadPoolExecutor(max_workers=settings.DETECTOR_POSTPROCESSING_CPU_WORKERS) as pool:
                            prepared = list(pool.map(self.prepare_image, image_splits))
                    else:
                        prepared = [self.prepare_image(part) for part in image_splits]
                    pixels = self.pad_to_batch_size(np.stack(prepared, axis=0), rows)

            # maps stay uint8 all the way into the CRAFT postprocess — on a
            # single-core host the float32 expansion of full-page maps costs
            # more than the box extraction itself; the affinity channel is
            # only shipped/materialized when the caller asked for the maps
            n_maps = self.config.num_classes if include_maps else 1
            with stage("detection.forward"):
                if device_resize:
                    out = self._forward_resize(
                        self.params, jnp.asarray(pixels), jnp.asarray(Vs), jnp.asarray(Hs), jnp.asarray(gid)
                    )
                else:
                    out = self._forward(self.params, jnp.asarray(pixels))
            with stage("detection.device_get"):
                compact = np.asarray(jax.device_get(out[:n_real, :, :, :n_maps]))

            preds: List[List[np.ndarray]] = []
            out_wh = (self.processor_size[1], self.processor_size[0])
            with stage("detection.stitch"):
                for i, (idx, height) in enumerate(zip(split_index, split_heights)):
                    # host-side bilinear upsample of the quantized 1/4-res map
                    maps = [
                        cv2.resize(
                            np.ascontiguousarray(compact[i, :, :, k]), out_wh,
                            interpolation=cv2.INTER_LINEAR,
                        )
                        for k in range(n_maps)
                    ]
                    if len(preds) <= idx:
                        preds.append(maps)
                    else:
                        if height < proc_h:
                            maps = [m[:height, :] for m in maps]
                        preds[idx] = [np.vstack([old, new]) for old, new in zip(preds[idx], maps)]

            yield preds, [orig_sizes[j] for j in batch_image_idxs]
