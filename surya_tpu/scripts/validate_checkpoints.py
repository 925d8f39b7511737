"""One command between "network appears" and "accuracy proven".

Downloads every model checkpoint (via the normal loader path), runs all six
reference benchmarks, and applies the reference CI score gates
(benchmark/utils/verify_benchmark_scores.py, thresholds identical to
/root/reference/benchmark/utils/verify_benchmark_scores.py:6-44). Exits
nonzero if any gate fails, and writes a validation_summary.json next to the
per-benchmark result files.

Offline parity tests (tests/test_*_parity.py) prove the model math matches
the reference torch code; this command proves the full stack — manifest
download, weight conversion, processors, pipelines — reproduces the
reference's accuracy on the real datasets the moment checkpoints are
reachable. ``--smoke`` runs the synthetic-capable benchmarks offline to
exercise the plumbing without network.
"""

import importlib
import json
import os
import sys
import time

import click

from surya_tpu.logging import get_logger
from surya_tpu.settings import settings

logger = get_logger()

# (module, result file, gate name, supports --synthetic)
STAGES = [
    ("benchmark.detection", "det_bench.json", "detection", True),
    ("benchmark.recognition", "rec_bench.json", "recognition", True),
    ("benchmark.layout", "layout_bench.json", "layout", False),
    ("benchmark.ordering", "order_bench.json", "ordering", False),
    ("benchmark.table_recognition", "table_rec_bench.json", "table_recognition", True),
    ("benchmark.texify", "texify_bench.json", "texify", False),
]


def run_stage(mod_name: str, results_dir: str, max_rows, synthetic: bool):
    mod = importlib.import_module(mod_name)
    kwargs = {p.name: p.default for p in mod.main.params}
    kwargs["results_dir"] = results_dir
    if max_rows is not None:
        kwargs["max_rows"] = max_rows
    if "synthetic" in kwargs:
        kwargs["synthetic"] = synthetic
    mod.main.callback(**kwargs)


@click.command(help="Download checkpoints, run all benchmarks, apply the reference score gates.")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=None, help="Limit rows per benchmark (CI smoke uses 2-5).")
@click.option("--only", multiple=True, help="Run only these gates (e.g. --only detection --only recognition).")
@click.option("--smoke", is_flag=True, default=False,
              help="Offline plumbing check: synthetic data, gates reported but not enforced.")
def main(results_dir: str, max_rows, only, smoke: bool):
    from benchmark.utils.verify_benchmark_scores import VERIFIERS

    if not smoke and settings.ALLOW_RANDOM_WEIGHTS:
        raise click.ClickException(
            "ALLOW_RANDOM_WEIGHTS is set — validation must run real checkpoints "
            "(use --smoke for the offline plumbing check)"
        )

    known_gates = {gate for _, _, gate, _ in STAGES}
    unknown = set(only) - known_gates
    if unknown:
        raise click.ClickException(
            f"unknown gate(s) {sorted(unknown)}; valid: {sorted(known_gates)}"
        )

    os.makedirs(results_dir, exist_ok=True)
    summary = {}
    failed = []
    for mod_name, result_file, gate, has_synthetic in STAGES:
        if only and gate not in only:
            continue
        if smoke and not has_synthetic:
            summary[gate] = {"status": "skipped", "reason": "no synthetic mode"}
            continue
        t0 = time.time()
        try:
            run_stage(mod_name, results_dir, max_rows, synthetic=smoke)
        except Exception as e:  # dataset/download/pipeline failure
            summary[gate] = {"status": "error", "error": f"{type(e).__name__}: {e}"}
            failed.append(gate)
            logger.error("%s benchmark failed: %s", gate, e)
            continue
        path = os.path.join(results_dir, result_file)
        with open(path) as f:
            data = json.load(f)
        try:
            VERIFIERS[gate](data)
            status = "pass"
        except ValueError as e:
            status = "below threshold"
            if not smoke:
                failed.append(gate)
            logger.warning("%s gate: %s", gate, e)
        except Exception as e:  # structural mismatch — always fatal
            status = f"structure error: {e}"
            failed.append(gate)
        summary[gate] = {"status": status, "seconds": round(time.time() - t0, 1), "results": result_file}
        logger.info("%s: %s (%.1fs)", gate, status, time.time() - t0)

    with open(os.path.join(results_dir, "validation_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    if failed:
        raise click.ClickException(f"gates failed: {', '.join(failed)}")
    print("all gates passed" if not smoke else "smoke run complete")


if __name__ == "__main__":
    main()
