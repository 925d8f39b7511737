"""Benchmark metric/scoring unit tests."""

import pytest


def test_precision_recall_perfect():
    from benchmark.utils.metrics import precision_recall

    boxes = [[0, 0, 10, 10], [20, 20, 30, 30]]
    m = precision_recall(boxes, boxes)
    assert m["precision"] == 1 and m["recall"] == 1


def test_precision_recall_miss():
    from benchmark.utils.metrics import precision_recall

    m = precision_recall([[100, 100, 110, 110]], [[0, 0, 10, 10]])
    assert m["precision"] == 0 and m["recall"] == 0
    assert precision_recall([], [[0, 0, 1, 1]]) == {"precision": 0, "recall": 0}
    assert precision_recall([[0, 0, 1, 1]], []) == {"precision": 1, "recall": 1}


def test_penalized_iou():
    from benchmark.utils.metrics import penalized_iou_score

    boxes = [[0, 0, 10, 10], [20, 20, 30, 30]]
    assert penalized_iou_score(boxes, boxes) == pytest.approx(1.0)
    # one missing reference pulls the score down with a -1 penalty
    assert penalized_iou_score(boxes[:1], boxes) == pytest.approx((1.0 - 1.0) / 2)


def test_rank_accuracy():
    from benchmark.utils.metrics import rank_accuracy

    assert rank_accuracy([1, 2, 3], [1, 2, 3]) == 1.0
    assert rank_accuracy([3, 2, 1], [1, 2, 3]) == 0.0


def test_overlap_score():
    from benchmark.utils.scoring import overlap_score

    scores, weights, match = overlap_score(["hello world"], ["hello world", "other"])
    assert sum(scores) / sum(weights) == pytest.approx(1.0)
    assert match[0] == 0


def test_verify_gates():
    from benchmark.utils.verify_benchmark_scores import verify_det, verify_rec

    verify_det({"metrics": {"surya": {"precision": 0.95, "recall": 0.95}}})
    with pytest.raises(ValueError):
        verify_det({"metrics": {"surya": {"precision": 0.5, "recall": 0.95}}})
    verify_rec({"surya": {"avg_score": 0.97}})
    with pytest.raises(ValueError):
        verify_rec({"surya": {"avg_score": 0.5}})


def test_tesseract_baseline_gating():
    """Language mapping works without pytesseract; OCR entry points raise a
    clear ImportError when it's absent (it is in this image)."""
    import pytest

    from benchmark.utils.tesseract import (
        TESS_LANGUAGE_TO_CODE,
        surya_lang_to_tesseract,
        tesseract_ocr,
    )

    assert surya_lang_to_tesseract("en") == "eng"
    assert surya_lang_to_tesseract("zh") == "chi_sim"
    assert surya_lang_to_tesseract("_math") is None
    assert TESS_LANGUAGE_TO_CODE["German"] == "deu"

    try:
        import pytesseract  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="tesseract"):
            tesseract_ocr(None, [], "eng")


def test_textract_baseline_gating():
    from benchmark.utils.textract import textract_ocr_parallel

    try:
        import textractor  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="textract"):
            textract_ocr_parallel([])


def test_join_lines_merges_stacked_fragments():
    from benchmark.utils.bbox import join_lines, merge_boxes

    assert merge_boxes((0, 0, 5, 5), (2, 2, 9, 9)) == (0, 0, 9, 9)
    # a horizontally-contained fragment whose bottom nearly touches the wide
    # box's top merges into one line (reference bbox.py join rule: box1 top
    # vs box2 bottom within max_gap, box1 contains box2 horizontally)
    boxes = [(0, (0, 10, 100, 20)), (1, (10, 2, 90, 8)), (2, (0, 50, 100, 60))]
    joined = join_lines(boxes)
    assert len(joined) == 2
    assert joined[0] == (0, 2, 100, 20)


def test_tatr_box_conversion():
    """DETR cxcywh->pixel xyxy reduction keeps only row/column objects."""
    torch = pytest.importorskip("torch")
    from benchmark.utils.tatr import _boxes_to_objects, _structure_batch
    from PIL import Image

    logits = torch.full((1, 3, 4), -10.0)
    logits[0, 0, 0] = 10.0  # row
    logits[0, 1, 1] = 10.0  # column
    logits[0, 2, 3] = 10.0  # no object
    boxes = torch.tensor([[[0.5, 0.1, 1.0, 0.2], [0.2, 0.5, 0.4, 1.0], [0.5, 0.5, 0.1, 0.1]]])
    id2label = {0: "table row", 1: "table column", 3: "no object"}
    out = _boxes_to_objects(logits, boxes, [(200, 100)], id2label)
    assert len(out) == 1
    assert len(out[0]["rows"]) == 1 and len(out[0]["cols"]) == 1
    assert out[0]["rows"][0]["bbox"] == pytest.approx([0.0, 0.0, 200.0, 20.0])

    batch = _structure_batch([Image.new("RGB", (2000, 1000), "white")])
    assert batch.shape == (1, 3, 500, 1000)
