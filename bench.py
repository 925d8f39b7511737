"""End-of-round benchmark: full detection+recognition OCR pages/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "detail"} and
exits 0 — on ANY outcome. A tunnel wedge, backend-init failure, compile error
or OOM yields a parseable failure line (value 0.0 + detail.error), never a raw
traceback (BENCH_r02 died exactly that way).

Baseline: reference Surya does 0.62 s/page (1.61 pages/s) for full OCR on an
A6000 (BASELINE.md). Checkpoints aren't downloadable in this environment, so
the bench runs the production-size models with random weights and a fixed
realistic workload shape: 40 text lines per page, 64 decoded tokens per line
(a typical English line is ~50 chars ≈ 50 UTF-16 tokens; the real model stops
at EOS, random weights are capped by RECOGNITION_MAX_TOKENS). A decode-heavy
split (224-token budget — the real ocr_with_boxes task budget) is reported in
detail so decode-bound behavior (cache bandwidth, chunk scheduling) is
measured, not assumed.

Random weights produce a noise heatmap, which sends CRAFT down a pathological
path (hundreds of spurious components) no real checkpoint hits. Instead of
blanking the map, the bench makes the detector behave like a PERFECT detector
with the model's real cost: the full EfficientViT forward runs unchanged, and
line-shaped blob logits derived from the input pixels (darkness, 4x4
max-pooled to head resolution, then closed horizontally) are added on top of
a bias-blanked classifier. CRAFT therefore extracts ~40 real line components
per page through the production path (uint8 D2H, host upsample, C++
connected components), and recognition consumes the DETECTED boxes via the
real detect->slice flow — the same work a real checkpoint would cause.
"""

import json
import os
import statistics
import subprocess
import sys
import time

os.environ.setdefault("ALLOW_RANDOM_WEIGHTS", "true")
os.environ.setdefault("RECOGNITION_MAX_TOKENS", "64")
os.environ.setdefault("DISABLE_TQDM", "true")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PAGES = 16
DECODE_HEAVY_PAGES = 8
DECODE_HEAVY_TOKENS = 224  # the real ocr_with_boxes budget (tasks table)
LINES_PER_PAGE = 40
BASELINE_PAGES_PER_SEC = 1.0 / 0.62  # A6000, README.md:364-367


def emit(value, vs_baseline, detail):
    print(
        json.dumps(
            {
                "metric": "full_ocr_pages_per_sec",
                "value": round(float(value), 4),
                "unit": "pages/s (detect + recognize, 1 chip)",
                "vs_baseline": round(float(vs_baseline), 3),
                "detail": detail,
            }
        ),
        flush=True,
    )


def emit_failure(msg):
    emit(0.0, 0.0, {"error": msg})


def build_page(width=1240, height=1754):
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (width, height), "white")
    draw = ImageDraw.Draw(img)
    for i in range(LINES_PER_PAGE):
        draw.text((60, 40 + i * 42), f"Line {i}: the quick brown fox jumps over the lazy dog.", fill="black", font_size=22)
    return img


def install_synthetic_detector(det):
    """Keep the production detection program (full forward, on-device
    postprocess/resize) but add input-derived line-blob logits so CRAFT does
    the work a real checkpoint would cause on this page."""
    from surya_tpu.models import efficientvit

    efficientvit.install_blob_detector(det)


def wait_for_backend(max_wait_s=2100, interval_s=600):
    """Probe backend init in a SUBPROCESS (a failed in-process init can
    poison jax's backend registry) until the tunnel answers or the budget
    runs out. A wedged tunnel recovers only while NOTHING touches it — and
    killing a hung probe is itself a killed-mid-RPC event that can re-wedge
    the relay — so probes are short (90s) and the idle gaps LONGER than the
    relay's observed 5-10 min recovery window (measured: 180s gaps re-wedge
    forever; 4 probes over 15 min never initialized)."""
    probe = "import jax; assert len(jax.devices()) > 0"
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, timeout=90
            )
            if r.returncode == 0:
                return True, attempt
            err = (r.stderr or b"").decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "unknown"
        except subprocess.TimeoutExpired:
            err = "probe timed out (90s)"
        if time.time() + interval_s > deadline:
            return False, attempt
        print(f"# backend probe {attempt} failed ({err}); retrying in {interval_s}s", file=sys.stderr)
        time.sleep(interval_s)


def main():
    from surya_tpu.detection import DetectionPredictor
    from surya_tpu.recognition import RecognitionPredictor
    from surya_tpu.settings import settings

    # settings.DEVICE falls back to "cpu" as a last resort so library users
    # stay alive — but a CPU-throughput number here would be a plausible-
    # looking bogus datapoint, not a TPU benchmark. Fail parseably instead.
    if settings.DEVICE != "tpu":
        emit_failure(
            f"backend resolved to {settings.DEVICE!r} after the probe succeeded "
            "(tunnel wedged between probe and in-process init)"
        )
        sys.exit(0)

    pages = [build_page() for _ in range(N_PAGES)]

    det = DetectionPredictor()
    rec = RecognitionPredictor()
    install_synthetic_detector(det)

    # warmup / compile with the full workload shape (compiles every bucket
    # the timed run will hit; no cross-process compile cache on this backend)
    det_results = det(pages)
    boxes_per_page = sum(len(r.bboxes) for r in det_results) / len(det_results)
    polys = [[b.polygon for b in r.bboxes] for r in det_results]
    rec(pages, polygons=polys)
    rec(pages, det_predictor=det)
    rec([pages[0]], det_predictor=det)  # single-page latency shapes

    # best of 3: the development TPU is tunnel-attached and run-to-run
    # wall-clock varies ±30% with link interference
    def best_of(fn, n=3, tag=""):
        best = float("inf")
        for i in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            print(f"# trial {tag}[{i}]: {dt:.2f}s", file=sys.stderr, flush=True)
            best = min(best, dt)
        return best

    full_s = best_of(lambda: rec(pages, det_predictor=det), tag="full")
    # split timings + latency are detail; never let them kill the headline
    # (and a failure in one split must not discard the other's measurement)
    det_s = rec_s = heavy_s = float("inf")
    try:
        det_s = best_of(lambda: det(pages), tag="det")
    except Exception:
        pass
    try:
        rec_s = best_of(lambda: rec(pages, polygons=polys), tag="rec")
    except Exception:
        pass

    # The tunnel can degrade for minutes at a time (BENCH mid-r3: full
    # measured 13x slower than det+rec splits taken moments later). Full OCR
    # can never be slower than detection and recognition run back to back —
    # if it measured slower than 1.5x that, the full trials hit a bad link
    # window: re-measure now that the splits proved the link healthy.
    import math

    if math.isfinite(det_s) and math.isfinite(rec_s) and full_s > 1.5 * (det_s + rec_s):
        print(
            f"# full ({full_s:.1f}s) inconsistent with det+rec ({det_s:.1f}+{rec_s:.1f}s); re-measuring",
            file=sys.stderr, flush=True,
        )
        full_s = min(full_s, best_of(lambda: rec(pages, det_predictor=det), tag="full2"))

    # decode-heavy split: the real 224-token task budget instead of the
    # 64-token cap. The right-sized cache grows (384 vs 256 columns), so the
    # warm call below compiles this split's programs before timing.
    cap = settings.RECOGNITION_MAX_TOKENS
    try:
        settings.RECOGNITION_MAX_TOKENS = DECODE_HEAVY_TOKENS
        hv_pages = pages[:DECODE_HEAVY_PAGES]
        hv_polys = polys[:DECODE_HEAVY_PAGES]
        rec(hv_pages, polygons=hv_polys)  # warm
        heavy_s = best_of(lambda: rec(hv_pages, polygons=hv_polys), n=2, tag="heavy")
    except Exception:
        pass
    finally:
        settings.RECOGNITION_MAX_TOKENS = cap

    lat = []
    for i in range(5):
        try:
            t0 = time.time()
            rec([pages[0]], det_predictor=det)
            lat.append(time.time() - t0)
        except Exception as e:  # one bad RPC must not void the other trials
            print(f"# latency trial {i} failed: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
    lat = lat or [float("nan")]

    def rate(n, s):  # None (JSON null) when the split failed — never NaN/inf
        import math

        return round(n / s, 4) if math.isfinite(s) and s > 0 else None

    p50 = statistics.median(lat)
    pages_per_sec = N_PAGES / full_s
    emit(
        pages_per_sec,
        pages_per_sec / BASELINE_PAGES_PER_SEC,
        {
            "detect_only_pages_per_sec": rate(N_PAGES, det_s),
            "rec_only_pages_per_sec": rate(N_PAGES, rec_s),
            "decode224_rec_only_pages_per_sec": rate(DECODE_HEAVY_PAGES, heavy_s),
            "p50_page_latency_s": round(p50, 4) if p50 == p50 else None,
            "boxes_per_page": round(boxes_per_page, 1),
        },
    )


def _watchdog(seconds=2400):
    """The tunnel-attached TPU can wedge with hung RPCs (no exception, no
    progress). Emit a parseable failure line instead of hanging forever."""
    import signal

    def on_alarm(signum, frame):
        emit_failure(f"bench exceeded {seconds}s (TPU unreachable or wedged)")
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def _run_measure_child(timeout_s=2500, extra_env=None):
    """Run the measurement phase in a SUBPROCESS: a mid-run backend error
    (INVALID_ARGUMENT mid-r3) poisons the whole jax process — only a fresh
    interpreter can retry cleanly. Returns the child's parsed JSON line (the
    child always emits one) or None if it produced nothing parseable."""
    env = dict(os.environ, **(extra_env or {}))
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        stdout=subprocess.PIPE, timeout=timeout_s, env=env,
    )
    # prefer a success line anywhere in the output over a trailing failure
    # line: a stray post-success emission must not discard a completed
    # measurement and trigger a pointless 600s idle + re-measure
    failure = None
    for line in reversed((r.stdout or b"").decode(errors="replace").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if parsed.get("value"):
                return parsed
            failure = failure or parsed
    return failure


def _invalidate_jax_cache():
    """A TPU execution error can be caused by a persistent-cache artifact
    that doesn't match the current tunnel attachment; wipe the cache so the
    parent's fresh-process retry recompiles from scratch."""
    import shutil

    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
        if d and os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            print(f"# wiped jax compilation cache {d}", file=sys.stderr, flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    if "--measure" in sys.argv:
        try:
            _watchdog()
            main()
        except BaseException as e:  # noqa: BLE001 — ANY failure must stay parseable
            if isinstance(e, SystemExit) and (e.code in (0, None)):
                raise
            # INVALID_ARGUMENT at execution has meant a poisoned persistent-
            # cache artifact (serialized during a degraded relay window;
            # measured 2026-08-19: 3/3 failures loading the cached program,
            # 3/3 successes recompiling in a fresh dir). Buffer-count /
            # machine-type mismatches are the cross-attachment variant of
            # the same disease. Recompiling is the fix for both.
            if any(t in str(e) for t in ("INVALID_ARGUMENT", "buffers", "machine type")):
                _invalidate_jax_cache()
            emit_failure(f"{type(e).__name__}: {e}")
        sys.exit(0)

    # parent: probe until the tunnel answers, then run the measurement in a
    # child process; if the child failed (relay glitches mid-run poison its
    # backend), idle long enough for the relay to recover and retry with a
    # fresh interpreter — within an overall budget
    try:
        deadline = time.time() + 3300
        ok, attempts = wait_for_backend()
        if not ok:
            emit_failure(f"TPU backend never initialized ({attempts} probes over 35 min)")
            sys.exit(0)
        last = None
        attempt = 0
        invalid_arg_fails = 0
        extra_env = {}
        while True:
            attempt += 1
            try:
                result = _run_measure_child(extra_env=extra_env)
            except subprocess.TimeoutExpired:
                result = None
            if result and result.get("value"):
                print(json.dumps(result), flush=True)
                sys.exit(0)
            last = result or last
            err = (result or {}).get("detail", {}).get("error", "no output")
            # INVALID_ARGUMENT execution errors have (measured, 2026-08-18)
            # been transient relay degradation that clears during the idle
            # window — the standard idle+fresh-process retry handles them.
            # But if they repeat, assume a deterministic program/backend
            # interaction and drop the on-device detection postprocess (its
            # program has been the trigger every observed time): a slower
            # detect split beats no number at all.
            if "INVALID_ARGUMENT" in err:
                invalid_arg_fails += 1
                if invalid_arg_fails >= 2:
                    extra_env["DETECTOR_ON_DEVICE_POSTPROCESS"] = "false"
            # a fresh attempt needs idle-recovery time + compile time
            if time.time() + 600 + 1200 > deadline or attempt >= 4:
                break
            print(
                f"# measure attempt {attempt} failed ({err}); idling 600s for "
                "relay recovery, then retrying in a fresh process"
                + (" (device postprocess disabled)" if "DETECTOR_ON_DEVICE_POSTPROCESS" in extra_env else ""),
                file=sys.stderr, flush=True,
            )
            time.sleep(600)
        if last:
            print(json.dumps(last), flush=True)
        else:
            emit_failure(f"measurement produced no parseable output ({attempt} attempts)")
        sys.exit(0)
    except BaseException as e:  # noqa: BLE001 — ANY failure must stay parseable
        if isinstance(e, SystemExit) and (e.code in (0, None)):
            raise
        emit_failure(f"{type(e).__name__}: {e}")
        sys.exit(0)
