"""Predictor registry (reference: surya/models.py:16-25)."""

from __future__ import annotations

from typing import Optional


def load_predictors(checkpoints: Optional[dict] = None) -> dict:
    """Construct all five predictors. checkpoints: optional per-task override
    dict with keys detection/recognition/layout/table_rec/ocr_error."""
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.layout import LayoutPredictor
    from surya_tpu.ocr_error import OCRErrorPredictor
    from surya_tpu.recognition import RecognitionPredictor
    from surya_tpu.table_rec import TableRecPredictor

    checkpoints = checkpoints or {}
    return {
        "layout": LayoutPredictor(checkpoints.get("layout")),
        "ocr_error": OCRErrorPredictor(checkpoints.get("ocr_error")),
        "recognition": RecognitionPredictor(checkpoints.get("recognition")),
        "detection": DetectionPredictor(checkpoints.get("detection")),
        "table_rec": TableRecPredictor(checkpoints.get("table_rec")),
    }
