"""Detection predictor end-to-end tests (model runs with random weights; these
validate pipeline mechanics: chunking, batching, schema shape — mirroring the
reference's tests/test_detection.py)."""

import numpy as np
import pytest

from surya_tpu.detection.schema import TextDetectionResult


@pytest.fixture(scope="module")
def detection_predictor():
    from surya_tpu.detection import DetectionPredictor

    return DetectionPredictor(tiny=True)


def test_detection_schema(detection_predictor, test_image):
    results = detection_predictor([test_image])
    assert len(results) == 1
    assert isinstance(results[0], TextDetectionResult)
    assert results[0].image_bbox == [0, 0, 1024, 1024]


def test_detection_chunking(detection_predictor, test_image_tall):
    # 4096-tall page → vertical chunks re-stitched into one heatmap
    gen = detection_predictor.batch_detection([test_image_tall])
    preds, sizes = next(gen)
    assert sizes == [(4096, 4096)]
    heatmap = preds[0][0]
    proc_h = detection_predictor.processor_size[0]
    import math

    expected_rows = proc_h * (math.ceil(4096 / proc_h) - 1) + (4096 - proc_h * (math.ceil(4096 / proc_h) - 1))
    assert heatmap.shape[0] == expected_rows


def test_detection_batch_of_images(detection_predictor, test_image):
    results = detection_predictor([test_image, test_image, test_image])
    assert len(results) == 3


def test_heatmap_boxes_synthetic():
    """CRAFT postprocess finds a synthetic blob with high confidence."""
    from surya_tpu.detection.heatmap import get_detected_boxes

    heat = np.zeros((200, 200), np.float32)
    heat[50:70, 20:180] = 0.9
    boxes = get_detected_boxes(heat)
    assert len(boxes) == 1
    bbox = boxes[0].bbox
    assert bbox[0] <= 21 and bbox[2] >= 178
    assert boxes[0].confidence == 1.0


def test_pipelined_batches_match_single_dispatch():
    """DETECTOR_PIPELINE_BATCH=1 forces one-page dispatches with one in
    flight; boxes must equal the unpipelined run (on CPU the cap defaults to
    batch_size, so the TPU pipelining path is otherwise unexercised)."""
    import numpy as np
    from PIL import Image, ImageDraw

    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit
    from surya_tpu.settings import settings

    pages = []
    for p in range(3):
        img = Image.new("RGB", (640, 400), "white")
        d = ImageDraw.Draw(img)
        for i in range(2):
            d.text((30, 40 + 120 * i), f"page {p} line {i}", fill="black", font_size=28)
        pages.append(img)

    det = DetectionPredictor(tiny=True)
    efficientvit.install_blob_detector(det)
    old = settings.DETECTOR_PIPELINE_BATCH
    try:
        settings.DETECTOR_PIPELINE_BATCH = None
        base = det([p.copy() for p in pages])
        settings.DETECTOR_PIPELINE_BATCH = 1
        piped = det([p.copy() for p in pages])
    finally:
        settings.DETECTOR_PIPELINE_BATCH = old

    assert len(base) == len(piped) == len(pages)
    for b, q in zip(base, piped):
        assert len(b.bboxes) == len(q.bboxes)
        for bb, qb in zip(b.bboxes, q.bboxes):
            assert np.allclose(bb.polygon, qb.polygon, atol=1e-4)
