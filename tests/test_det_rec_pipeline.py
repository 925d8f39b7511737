"""det->rec software pipeline (RECOGNITION_DET_PIPELINE_PAGES): page groups
recognized while the next group's detection runs in a worker thread must
produce exactly the results of the sequential path (reference semantics:
/root/reference/surya/recognition/__init__.py:773-942 — one detect pass, then
recognize; here the split into groups is invisible to the caller)."""

import numpy as np
import pytest
from PIL import Image, ImageDraw


def _pages(n):
    pages = []
    for p in range(n):
        img = Image.new("RGB", (640, 360), "white")
        d = ImageDraw.Draw(img)
        for i in range(3):
            d.text((20, 30 + i * 70), f"page {p} line {i} sample text", fill="black", font_size=24)
        pages.append(img)
    return pages


@pytest.fixture(scope="module")
def tiny_pipeline():
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit
    from surya_tpu.recognition import RecognitionPredictor

    det = DetectionPredictor(tiny=True)
    efficientvit.install_blob_detector(det)
    rec = RecognitionPredictor(tiny=True)
    return det, rec


def _flatten(results):
    out = []
    for r in results:
        out.append(
            [
                (ln.text, tuple(np.asarray(ln.polygon).round(2).ravel().tolist()))
                for ln in r.text_lines
            ]
        )
    return out


def test_pipelined_matches_sequential(tiny_pipeline):
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(5)

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        seq = rec([p.copy() for p in pages], det_predictor=det)
        settings.RECOGNITION_DET_PIPELINE_PAGES = 2
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert len(piped) == len(seq) == len(pages)
    assert _flatten(piped) == _flatten(seq)


def test_pipeline_empty_group(tiny_pipeline):
    """A page group in which detection finds nothing must yield empty
    OCRResults for its pages, not truncate the result list."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = _pages(3) + [Image.new("RGB", (640, 360), "white") for _ in range(2)]

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    old_max = settings.RECOGNITION_MAX_TOKENS
    settings.RECOGNITION_MAX_TOKENS = 8
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 3
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g
        settings.RECOGNITION_MAX_TOKENS = old_max

    assert len(piped) == len(pages)
    for r in piped[:3]:
        assert len(r.text_lines) > 0


def test_all_blank_pages_same_shape_both_paths(tiny_pipeline):
    """Zero detected lines still yields one empty OCRResult per page on BOTH
    the sequential and pipelined paths — the result list must never shrink
    below the page count (a caller zips results against input pages)."""
    from surya_tpu.settings import settings

    det, rec = tiny_pipeline
    pages = [Image.new("RGB", (640, 360), "white") for _ in range(3)]

    old_g = settings.RECOGNITION_DET_PIPELINE_PAGES
    try:
        settings.RECOGNITION_DET_PIPELINE_PAGES = 0
        seq = rec([p.copy() for p in pages], det_predictor=det)
        settings.RECOGNITION_DET_PIPELINE_PAGES = 2
        piped = rec([p.copy() for p in pages], det_predictor=det)
    finally:
        settings.RECOGNITION_DET_PIPELINE_PAGES = old_g

    assert len(seq) == len(piped) == len(pages)
    assert all(r.text_lines == [] for r in seq + piped)
