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
