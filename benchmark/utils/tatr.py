"""Table-Transformer (TATR) competitor baseline for the table-recognition
benchmark (reference: benchmark/utils/tatr.py). Runs the public
microsoft/table-transformer structure model through HF transformers (torch,
CPU is fine) and reduces its object detections to row/column boxes in the
same shape the benchmark scores. Needs network access for the checkpoint —
load errors surface as a clear RuntimeError."""

from __future__ import annotations

from typing import List

import numpy as np

TATR_CHECKPOINT = "microsoft/table-transformer-structure-recognition-v1.1-all"


def _structure_batch(images, max_size: int = 1000) -> "np.ndarray":
    """MaxResize -> [0,1] -> ImageNet normalize -> NCHW float32, padded to the
    batch max so torch gets one dense tensor (the reference resizes each image
    independently and stacks — equal sizes in the bench set)."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    arrs = []
    for image in images:
        w, h = image.size
        scale = max_size / max(w, h)
        resized = image.resize((int(round(scale * w)), int(round(scale * h))))
        a = np.asarray(resized.convert("RGB"), np.float32) / 255.0
        arrs.append(((a - mean) / std).transpose(2, 0, 1))
    ch = arrs[0].shape[0]
    H = max(a.shape[1] for a in arrs)
    W = max(a.shape[2] for a in arrs)
    out = np.zeros((len(arrs), ch, H, W), np.float32)
    for i, a in enumerate(arrs):
        out[i, :, : a.shape[1], : a.shape[2]] = a
    return out


def load_tatr():
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForObjectDetection
    except ImportError as e:
        raise ImportError("the TATR baseline needs torch + transformers") from e
    try:
        return AutoModelForObjectDetection.from_pretrained(TATR_CHECKPOINT).eval()
    except Exception as e:
        raise RuntimeError(
            f"could not load {TATR_CHECKPOINT} (network/cache required): {e}"
        ) from e


def _boxes_to_objects(logits, pred_boxes, img_sizes, id2label) -> List[dict]:
    """Per-image row/col dicts from DETR-style outputs (cxcywh in [0,1])."""
    probs = logits.softmax(-1)
    scores, labels = probs.max(-1)
    batch = []
    for i, (w, h) in enumerate(img_sizes):
        rows, cols = [], []
        for label, score, (cx, cy, bw, bh) in zip(
            labels[i].tolist(), scores[i].tolist(), pred_boxes[i].tolist()
        ):
            name = id2label.get(int(label), "no object")
            if name not in ("table row", "table column"):
                continue
            bbox = [
                (cx - bw / 2) * w, (cy - bh / 2) * h,
                (cx + bw / 2) * w, (cy + bh / 2) * h,
            ]
            obj = {"label": name, "score": float(score), "bbox": [float(v) for v in bbox]}
            (rows if name == "table row" else cols).append(obj)
        batch.append({"rows": rows, "cols": cols})
    return batch


def batch_inference_tatr(model, images, batch_size: int) -> List[dict]:
    import torch

    id2label = dict(model.config.id2label)
    id2label[len(id2label)] = "no object"
    results = []
    for i in range(0, len(images), batch_size):
        chunk = images[i : i + batch_size]
        pixel_values = torch.from_numpy(_structure_batch(chunk))
        with torch.no_grad():
            outputs = model(pixel_values)
        results.extend(
            _boxes_to_objects(
                outputs.logits, outputs["pred_boxes"],
                [img.size for img in chunk], id2label,
            )
        )
    return results
