"""bench.py's contract: ONE parseable JSON headline line, exit 0, under ANY
failure mode — the r2/r3 benches died without printing a number (VERDICT r3
item 1), so the emission machinery is regression-tested here without TPU
hardware."""

import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _parse_lines(stdout: bytes):
    out = []
    for line in stdout.decode(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_measure_child_emits_parseable_failure_without_tpu(tmp_path):
    """The measure child on a CPU-only box must refuse to report CPU
    throughput as a TPU number — but still print a parseable failure line
    and exit 0."""
    env = dict(
        os.environ,
        SURYA_BENCH_PROGRESS=str(tmp_path / "progress.json"),
        SURYA_BENCH_CHILD_ALARM="600",
        ALLOW_RANDOM_WEIGHTS="true",
    )
    r = subprocess.run(
        [sys.executable, BENCH, "--measure"],
        stdout=subprocess.PIPE, timeout=300, env=env,
    )
    assert r.returncode == 0
    parsed = _parse_lines(r.stdout)
    assert parsed, "no parseable JSON line"
    final = parsed[-1]
    assert final["metric"] == "full_ocr_pages_per_sec"
    assert final["value"] == 0.0
    assert "cpu" in final["detail"]["error"]


def test_sigterm_mid_measure_emits_best_so_far(tmp_path):
    """kill -TERM at any point after the first completed trial must still
    yield a nonzero headline (the acceptance criterion from the r3 verdict).
    Simulated with a stub measure that records a trial then sleeps."""
    stub = tmp_path / "stub.py"
    stub.write_text(
        "import sys, time\n"
        f"sys.path.insert(0, {os.path.dirname(BENCH)!r})\n"
        "import bench\n"
        "bench._measure_signals()\n"
        "bench.record(value=1.23, boxes_per_page=40.0)\n"
        "print('READY', file=sys.stderr, flush=True)\n"
        "time.sleep(600)\n"
    )
    env = dict(os.environ, SURYA_BENCH_PROGRESS=str(tmp_path / "p.json"))
    p = subprocess.Popen(
        [sys.executable, str(stub)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
    )
    try:
        # wait until the trial is recorded
        deadline = time.time() + 60
        line = p.stderr.readline()
        assert b"READY" in line, line
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=60)
        assert time.time() < deadline
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0
    parsed = _parse_lines(out)
    assert parsed and parsed[-1]["value"] == 1.23
    assert "signal" in parsed[-1]["detail"]["partial"]


def test_parent_emits_from_progress_when_child_died(tmp_path, monkeypatch):
    """If the measure child dies without emitting, the parent must emit
    best-so-far from the progress file."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    monkeypatch.setenv("SURYA_BENCH_PROGRESS", str(tmp_path / "p.json"))
    spec.loader.exec_module(bench)
    bench.PROGRESS_PATH = str(tmp_path / "p.json")

    bench.BEST.update({"value": 2.5, "detail": {"boxes_per_page": 40.0}})
    bench.save_progress()
    prog = bench.load_progress()
    assert prog["value"] == 2.5 and not prog["emitted_success"]

    printed = []
    monkeypatch.setattr(bench, "emit", lambda v, b, d: printed.append((v, b, d)))
    # mirror the parent's tail: emit from progress when no success line
    detail = dict(prog.get("detail", {}))
    detail["partial"] = "child died before emitting; parent emitted from progress file"
    bench.emit(prog["value"], prog["value"] / bench.BASELINE_PAGES_PER_SEC, detail)
    assert printed and printed[0][0] == 2.5
    assert printed[0][2]["boxes_per_page"] == 40.0
