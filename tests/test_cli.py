"""CLI plumbing tests (loader, range parsing, results.json shape via the
detection CLI on a tiny folder — mirrors the reference's scripts.yml smoke)."""

import json
import os

import pytest
from click.testing import CliRunner
from PIL import Image, ImageDraw


@pytest.fixture()
def image_folder(tmp_path):
    folder = tmp_path / "pages"
    folder.mkdir()
    for i in range(2):
        img = Image.new("RGB", (400, 300), "white")
        ImageDraw.Draw(img).text((20, 20), f"page {i}", fill="black", font_size=32)
        img.save(folder / f"page_{i}.png")
    return folder


def test_parse_range_str():
    from surya_tpu.scripts.config import CLILoader

    assert CLILoader.parse_range_str("0,5-7,20") == [0, 5, 6, 7, 20]
    assert CLILoader.parse_range_str("3,3,1") == [1, 3]


def test_folder_loading(image_folder):
    from surya_tpu.input.load import load_from_folder

    images, names = load_from_folder(str(image_folder))
    assert len(images) == 2
    assert names == ["page_0", "page_1"]


def test_detect_text_cli(image_folder, tmp_path, monkeypatch):
    import surya_tpu.scripts.detect_text as dt
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.scripts.detect_text import detect_text_cli

    # CLI plumbing is what's under test — the tiny model cuts the full-size
    # EfficientViT compile (~40s on this 1-cpu box) out of the suite
    monkeypatch.setattr(dt, "DetectionPredictor", lambda *a, **k: DetectionPredictor(tiny=True))

    out_dir = tmp_path / "results"
    runner = CliRunner()
    result = runner.invoke(
        detect_text_cli, [str(image_folder), "--output_dir", str(out_dir)], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    results_file = out_dir / "pages" / "results.json"
    assert results_file.exists()
    data = json.loads(results_file.read_text())
    assert set(data.keys()) == {"page_0", "page_1"}
    assert data["page_0"][0]["image_bbox"] == [0, 0, 400, 300]


def test_draw_helpers():
    from surya_tpu.debug.draw import draw_polys_on_image, draw_text_on_image

    img = Image.new("RGB", (100, 100), "white")
    out = draw_polys_on_image([[[10, 10], [90, 10], [90, 40], [10, 40]]], img, labels=["x"])
    assert out.size == (100, 100)
    # the text page renders at 2x resolution (reference debug/text.py:79)
    out2 = draw_text_on_image([[10, 10, 90, 40]], ["hello <i>markup</i>"], (100, 100))
    assert out2.size == (200, 200)


def test_streamlit_app_helpers():
    """GUI module parses without streamlit; pure helpers behave like the
    reference's ocr_errors aggregation (surya/scripts/streamlit_app.py:54-58)."""
    from surya_tpu.scripts.streamlit_app import classify_pdf_text_quality

    assert classify_pdf_text_quality([]) == "This PDF has no text or very little text"
    assert classify_pdf_text_quality(["good"] * 9 + ["bad"]) == "This PDF has good text."
    assert (
        classify_pdf_text_quality(["good", "bad", "bad"])
        == "This PDF may have garbled or bad OCR text."
    )


def test_detect_layout_cli(image_folder, tmp_path, monkeypatch):
    import surya_tpu.scripts.detect_layout as dl
    from surya_tpu.layout import LayoutPredictor
    from surya_tpu.scripts.detect_layout import detect_layout_cli

    monkeypatch.setattr(dl, "LayoutPredictor", lambda *a, **k: LayoutPredictor(tiny=True))

    out_dir = tmp_path / "results"
    result = CliRunner().invoke(
        detect_layout_cli,
        [str(image_folder), "--output_dir", str(out_dir), "--images"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    data = json.loads((out_dir / "pages" / "results.json").read_text())
    assert set(data.keys()) == {"page_0", "page_1"}
    assert data["page_0"][0]["page"] == 1
    assert "bboxes" in data["page_0"][0]
    # --images wrote one layout artifact per page
    pngs = [p for p in (out_dir / "pages").iterdir() if p.suffix == ".png"]
    assert len(pngs) == 2


def test_ocr_latex_cli(image_folder, tmp_path, monkeypatch):
    import surya_tpu.scripts.ocr_latex as ol
    from surya_tpu.recognition import RecognitionPredictor
    from surya_tpu.scripts.ocr_latex import ocr_latex_cli
    from surya_tpu.settings import settings

    monkeypatch.setattr(ol, "RecognitionPredictor", lambda *a, **k: RecognitionPredictor(tiny=True))
    monkeypatch.setattr(settings, "RECOGNITION_MAX_TOKENS", 4)

    out_dir = tmp_path / "results"
    result = CliRunner().invoke(
        ocr_latex_cli, [str(image_folder), "--output_dir", str(out_dir)], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    data = json.loads((out_dir / "pages" / "results.json").read_text())
    assert set(data.keys()) == {"page_0", "page_1"}
    row = data["page_0"][0]
    assert set(row.keys()) == {"equation", "page"} and row["page"] == 1
    assert isinstance(row["equation"], str)


def test_ocr_text_cli(image_folder, tmp_path, monkeypatch):
    import surya_tpu.scripts.ocr_text as ot
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.models import efficientvit
    from surya_tpu.recognition import RecognitionPredictor
    from surya_tpu.scripts.ocr_text import ocr_text_cli
    from surya_tpu.settings import settings

    def tiny_det(*a, **k):
        det = DetectionPredictor(tiny=True)
        efficientvit.install_blob_detector(det)
        return det

    monkeypatch.setattr(ot, "DetectionPredictor", tiny_det)
    monkeypatch.setattr(ot, "RecognitionPredictor", lambda *a, **k: RecognitionPredictor(tiny=True))
    monkeypatch.setattr(settings, "RECOGNITION_MAX_TOKENS", 4)

    out_dir = tmp_path / "results"
    result = CliRunner().invoke(
        ocr_text_cli, [str(image_folder), "--output_dir", str(out_dir)], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    data = json.loads((out_dir / "pages" / "results.json").read_text())
    assert set(data.keys()) == {"page_0", "page_1"}
    assert "text_lines" in data["page_0"][0]
    assert data["page_0"][0]["page"] == 1


def test_table_recognition_cli(image_folder, tmp_path, monkeypatch):
    import surya_tpu.scripts.table_recognition as tr_mod
    from surya_tpu.layout import LayoutPredictor
    from surya_tpu.scripts.table_recognition import table_recognition_cli
    from surya_tpu.table_rec import TableRecPredictor, install_synthetic_tables

    def tiny_table(*a, **k):
        tr = TableRecPredictor(tiny=True)
        install_synthetic_tables(tr, n_rows=2, n_cols=2, n_cells=1)
        return tr

    monkeypatch.setattr(tr_mod, "LayoutPredictor", lambda *a, **k: LayoutPredictor(tiny=True))
    monkeypatch.setattr(tr_mod, "TableRecPredictor", tiny_table)

    out_dir = tmp_path / "results"
    result = CliRunner().invoke(
        table_recognition_cli,
        [str(image_folder), "--output_dir", str(out_dir), "--skip_table_detection"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    data = json.loads((out_dir / "pages" / "results.json").read_text())
    assert set(data.keys()) == {"page_0", "page_1"}
    table = data["page_0"][0]
    assert "rows" in table and "cols" in table and "cells" in table
    assert len(table["rows"]) == 2 and len(table["cols"]) == 2
