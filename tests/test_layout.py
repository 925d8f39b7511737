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
