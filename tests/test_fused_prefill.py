"""The fused prefill+decode dispatch must produce byte-identical results to
the unfused path."""

import pytest
from PIL import Image, ImageDraw


def test_fused_equals_unfused():
    from surya_tpu.recognition import RecognitionPredictor

    img = Image.new("RGB", (512, 512), "white")
    d = ImageDraw.Draw(img)
    for i in range(6):
        d.text((10, 10 + i * 60), f"line {i} text", fill="black", font_size=24)
    bboxes = [[[5, 5 + i * 60, 300, 50 + i * 60] for i in range(6)]]

    pred = RecognitionPredictor(tiny=True)
    pred.batch_size = 4
    pred.n_slots = 4
    pred.prefill_rows = 2
    pred.prefill_row_buckets = (2, 4)
    pred.patch_caps = (1024, 4096)

    fused = pred([img], bboxes=bboxes)

    fused_fn = pred._prefill_decode_fn
    pred._prefill_decode_fn = None  # force the unfused scheduler path
    try:
        unfused = pred([img], bboxes=bboxes)
    finally:
        pred._prefill_decode_fn = fused_fn

    assert len(fused) == len(unfused) == 1
    for a, b in zip(fused[0].text_lines, unfused[0].text_lines):
        assert a.text == b.text
        assert a.polygon == b.polygon
        assert a.confidence == pytest.approx(b.confidence, abs=1e-6)
        assert [c.polygon for c in a.chars] == [c.polygon for c in b.chars]
