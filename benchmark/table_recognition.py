"""Table recognition benchmark (reference: benchmark/table_recognition.py).
Penalized row/col IoU on datalab-to/fintabnet_bench (or synthetic offline)."""

import json
import os
import time

import click
from tabulate import tabulate

from benchmark.utils.data import load_hf_dataset, synthetic_table_pages
from benchmark.utils.metrics import penalized_iou_score
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.settings import settings
from surya_tpu.table_rec import TableRecPredictor


@click.command(help="Benchmark the table recognition model.")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=100)
@click.option("--synthetic", is_flag=True, default=False)
@click.option("--tatr", is_flag=True, default=False, help="Also run the Table-Transformer baseline.")
def main(results_dir: str, max_rows: int, synthetic: bool, tatr: bool):
    predictor = TableRecPredictor()

    if synthetic:
        images, ref_rows, ref_cols = synthetic_table_pages(max_rows)
    else:
        dataset = load_hf_dataset(settings.TABLE_REC_BENCH_DATASET_NAME, max_rows)
        images = convert_if_not_rgb(list(dataset["image"]))
        ref_rows = list(dataset["rows"])
        ref_cols = list(dataset["cols"])

    predictor(images[:1])  # compile
    start = time.time()
    predictions = predictor(images)
    total_time = time.time() - start

    row_scores, col_scores = [], []
    for pred, rows, cols in zip(predictions, ref_rows, ref_cols):
        pred_rows = [r.bbox for r in pred.rows]
        pred_cols = [c.bbox for c in pred.cols]
        row_scores.append(penalized_iou_score(pred_rows, rows))
        col_scores.append(penalized_iou_score(pred_cols, cols))

    out = {
        "surya": {
            "mean_row_iou": sum(row_scores) / len(row_scores),
            "mean_col_iou": sum(col_scores) / len(col_scores),
            "time_per_image": total_time / len(images),
        }
    }
    if tatr:
        from benchmark.utils.tatr import batch_inference_tatr, load_tatr

        tatr_model = load_tatr()
        start = time.time()
        tatr_predictions = batch_inference_tatr(tatr_model, images, 1)
        tatr_time = time.time() - start
        t_rows, t_cols = [], []
        for pred, rows, cols in zip(tatr_predictions, ref_rows, ref_cols):
            t_rows.append(penalized_iou_score([r["bbox"] for r in pred["rows"]], rows))
            t_cols.append(penalized_iou_score([c["bbox"] for c in pred["cols"]], cols))
        out["tatr"] = {
            "mean_row_iou": sum(t_rows) / len(t_rows),
            "mean_col_iou": sum(t_cols) / len(t_cols),
            "time_per_image": tatr_time / len(images),
        }

    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "table_rec_bench.json"), "w") as f:
        json.dump(out, f, indent=2)

    print(tabulate(
        [[m, out[m]["mean_row_iou"], out[m]["mean_col_iou"], out[m]["time_per_image"]] for m in out],
        headers=["model", "row iou", "col iou", "time/image (s)"],
    ))


if __name__ == "__main__":
    main()
