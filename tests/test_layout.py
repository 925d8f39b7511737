"""Layout predictor end-to-end tests (tiny random model; pipeline mechanics:
batching, slicing, top-k, schema — mirroring the reference tests/test_layout.py)."""

import pytest
from PIL import Image, ImageDraw

from surya_tpu.layout.schema import LayoutResult


@pytest.fixture(scope="module")
def layout_predictor():
    from surya_tpu.layout import LayoutPredictor

    pred = LayoutPredictor(tiny=True)
    pred.batch_size = 2
    return pred


def test_layout_schema(layout_predictor, test_image):
    results = layout_predictor([test_image])
    assert len(results) == 1
    assert isinstance(results[0], LayoutResult)
    assert results[0].image_bbox == [0, 0, 1024, 1024]
    for box in results[0].bboxes:
        assert box.label in {
            "Text", "TextInlineMath", "Code", "SectionHeader", "Caption", "Footnote",
            "Equation", "ListItem", "PageFooter", "PageHeader", "Picture", "Figure",
            "Table", "Form", "TableOfContents", "Handwriting",
        }
        assert box.top_k is None or len(box.top_k) <= 5
        assert box.position >= 0


def test_layout_slicing(layout_predictor):
    # > 1500px page triggers the slicer; result must be rejoined to one page
    tall = Image.new("RGB", (800, 2600), "white")
    ImageDraw.Draw(tall).text((10, 10), "Tall", fill="black", font_size=48)
    results = layout_predictor([tall])
    assert len(results) == 1
    assert results[0].sliced
    assert results[0].image_bbox[3] >= 2600


def test_layout_batching(layout_predictor, test_image):
    results = layout_predictor([test_image] * 3)
    assert len(results) == 3


def test_pipelined_batches_match_single_dispatch():
    """LAYOUT_PIPELINE_BATCH=2 forces multiple in-flight dispatches; results
    (count, order, boxes) must equal the single-dispatch run. On CPU the cap
    defaults to batch_size, so the TPU pipelining path needs this override to
    be exercised at all."""
    import numpy as np
    from PIL import Image, ImageDraw

    from surya_tpu.layout import LayoutPredictor
    from surya_tpu.settings import settings

    pages = []
    for p in range(5):
        img = Image.new("RGB", (512, 512), "white")
        d = ImageDraw.Draw(img)
        d.text((20, 30 + 40 * p), f"page {p}", fill="black", font_size=24)
        pages.append(img)

    lay = LayoutPredictor(tiny=True)
    old = settings.LAYOUT_PIPELINE_BATCH
    try:
        settings.LAYOUT_PIPELINE_BATCH = None
        base = lay([p.copy() for p in pages])
        settings.LAYOUT_PIPELINE_BATCH = 2
        piped = lay([p.copy() for p in pages])
    finally:
        settings.LAYOUT_PIPELINE_BATCH = old

    assert len(base) == len(piped) == len(pages)
    for b, q in zip(base, piped):
        assert len(b.bboxes) == len(q.bboxes)
        for bb, qb in zip(b.bboxes, q.bboxes):
            assert bb.label == qb.label
            assert np.allclose(bb.polygon, qb.polygon, atol=1e-4)
