"""Parity of the first-party C++ CRAFT postprocess vs the OpenCV path."""

import numpy as np
import pytest


def _synthetic_heatmap(seed=0):
    rng = np.random.default_rng(seed)
    heat = rng.uniform(0, 0.15, (300, 400)).astype(np.float32)
    # horizontal text-line blobs
    heat[40:58, 30:330] = rng.uniform(0.75, 0.95, (18, 300))
    heat[90:106, 50:250] = rng.uniform(0.7, 0.95, (16, 200))
    # a slightly rotated blob
    for i in range(20):
        heat[150 + i, 60 + i : 260 + i] = 0.85
    # a small blob under the size filter
    heat[250:252, 10:13] = 0.9
    return heat


def _quad_iou(a, b):
    ax0, ay0 = a[:, 0].min(), a[:, 1].min()
    ax1, ay1 = a[:, 0].max(), a[:, 1].max()
    bx0, by0 = b[:, 0].min(), b[:, 1].min()
    bx1, by1 = b[:, 0].max(), b[:, 1].max()
    iw = max(0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / union if union else 0


def test_native_matches_opencv():
    from surya_tpu import native
    from surya_tpu.detection import heatmap
    from surya_tpu.settings import settings

    if native.craft_ops() is None:
        pytest.skip("native craft_ops did not build")

    heat = _synthetic_heatmap()

    old = settings.USE_NATIVE_POSTPROCESS
    try:
        settings.USE_NATIVE_POSTPROCESS = False
        cv_boxes, cv_confs = heatmap.detect_boxes(heat, 0.6, 0.35)
        settings.USE_NATIVE_POSTPROCESS = True
        nat_boxes, nat_confs = heatmap.detect_boxes(heat, 0.6, 0.35)
    finally:
        settings.USE_NATIVE_POSTPROCESS = old

    assert len(nat_boxes) == len(cv_boxes)
    # component enumeration order may differ; match greedily by IoU
    used = set()
    for nb, nc in zip(nat_boxes, nat_confs):
        best_iou, best_j = 0, None
        for j, cb in enumerate(cv_boxes):
            if j in used:
                continue
            iou = _quad_iou(np.asarray(nb), np.asarray(cb))
            if iou > best_iou:
                best_iou, best_j = iou, j
        assert best_iou > 0.95, (nb, best_iou)
        assert abs(nc - cv_confs[best_j]) < 1e-3
        used.add(best_j)


def test_native_random_noise_agreement():
    """On pure-noise maps the two paths must still agree on box COUNT."""
    from surya_tpu import native
    from surya_tpu.detection import heatmap
    from surya_tpu.settings import settings

    if native.craft_ops() is None:
        pytest.skip("native craft_ops did not build")

    rng = np.random.default_rng(3)
    heat = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    old = settings.USE_NATIVE_POSTPROCESS
    try:
        settings.USE_NATIVE_POSTPROCESS = False
        cv_boxes, _ = heatmap.detect_boxes(heat, 0.6, 0.35)
        settings.USE_NATIVE_POSTPROCESS = True
        nat_boxes, _ = heatmap.detect_boxes(heat, 0.6, 0.35)
    finally:
        settings.USE_NATIVE_POSTPROCESS = old
    assert len(nat_boxes) == len(cv_boxes)


def test_native_uint8_matches_float():
    """The uint8 entry (quantized D2H maps) matches the float entry on the
    same heatmap quantized to value*255."""
    from surya_tpu import native

    if native.craft_ops() is None:
        pytest.skip("native craft_ops did not build")

    heat = _synthetic_heatmap(seed=7)
    heat_u8 = np.round(heat * 255.0).astype(np.uint8)
    # evaluate the float path on the SAME quantized values so component
    # structure is identical; only the pixel domain differs
    f_boxes, f_confs = native.extract_boxes(heat_u8.astype(np.float32) / 255.0, 0.6, 0.35)
    u_boxes, u_confs = native.extract_boxes(heat_u8, 0.6, 0.35)
    assert len(u_boxes) == len(f_boxes) > 0
    np.testing.assert_allclose(np.asarray(u_boxes), np.asarray(f_boxes), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u_confs), np.asarray(f_confs), atol=1e-5)


def test_dynamic_thresholds_uint8_matches_float():
    from surya_tpu.detection.heatmap import get_dynamic_thresholds

    heat = _synthetic_heatmap(seed=9)
    heat_u8 = np.round(heat * 255.0).astype(np.uint8)
    tf, lf = get_dynamic_thresholds(heat_u8.astype(np.float32) / 255.0, 0.6, 0.35)
    tu, lu = get_dynamic_thresholds(heat_u8, 0.6, 0.35)
    assert abs(tf - tu) < 1e-6 and abs(lf - lu) < 1e-6
