"""validate_checkpoints plumbing: the orchestration runs a benchmark, applies
the reference gate, and writes the summary (offline --smoke mode; the real
run needs network-reachable checkpoints)."""

import json

import pytest
from click.testing import CliRunner


def test_smoke_detection_stage(tmp_path, monkeypatch):
    import benchmark.detection as bd
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.scripts.validate_checkpoints import main

    # orchestration/gate plumbing is what's under test — skip the full-size
    # EfficientViT compile (~40s on this 1-cpu box)
    monkeypatch.setattr(bd, "DetectionPredictor", lambda *a, **k: DetectionPredictor(tiny=True))

    runner = CliRunner()
    result = runner.invoke(
        main,
        ["--results_dir", str(tmp_path), "--max_rows", "2", "--only", "detection", "--smoke"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    summary = json.loads((tmp_path / "validation_summary.json").read_text())
    assert "detection" in summary
    # random weights can't pass the gate, but the gate must RUN (structure ok)
    assert summary["detection"]["status"] in ("pass", "below threshold")
    assert (tmp_path / "det_bench.json").exists()


def test_refuses_random_weights_outside_smoke(tmp_path):
    from surya_tpu.scripts.validate_checkpoints import main

    runner = CliRunner()
    result = runner.invoke(main, ["--results_dir", str(tmp_path)])
    assert result.exit_code != 0
    assert "ALLOW_RANDOM_WEIGHTS" in result.output


def test_gate_functions_accept_reference_shapes():
    """The verifiers must match the reference's result-file structures
    (reference benchmark/utils/verify_benchmark_scores.py:6-44)."""
    from benchmark.utils.verify_benchmark_scores import VERIFIERS

    VERIFIERS["detection"]({"metrics": {"surya": {"precision": 0.95, "recall": 0.95}}})
    VERIFIERS["recognition"]({"surya": {"avg_score": 0.95}})
    VERIFIERS["layout"]({"metrics": {"Text": {"precision": 0.7, "recall": 0.7}}})
    VERIFIERS["ordering"]({"mean_accuracy": 0.8})
    VERIFIERS["table_recognition"]({"surya": {"mean_row_iou": 0.8, "mean_col_iou": 0.8}})
    VERIFIERS["texify"]({"scores": 0.1})
    with pytest.raises(ValueError):
        VERIFIERS["detection"]({"metrics": {"surya": {"precision": 0.5, "recall": 0.95}}})
