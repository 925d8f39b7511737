"""Detection benchmark (reference: benchmark/detection.py). Coverage-based
precision/recall on vikp/doclaynet_bench (or synthetic pages offline)."""

import json
import os
import time

import click
from tabulate import tabulate

from benchmark.utils.data import load_hf_dataset, synthetic_text_pages
from benchmark.utils.metrics import precision_recall
from surya_tpu.common.util import rescale_bbox
from surya_tpu.detection import DetectionPredictor
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.settings import settings


@click.command(help="Benchmark the detection model.")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=100)
@click.option("--synthetic", is_flag=True, default=False, help="Use synthetic pages (no dataset download).")
@click.option("--tesseract", is_flag=True, default=False, help="Also run the tesseract baseline.")
@click.option("--pdf_path", type=str, default=None, help="Benchmark against a real PDF's embedded text lines instead of a dataset.")
def main(results_dir: str, max_rows: int, synthetic: bool, tesseract: bool, pdf_path):
    det_predictor = DetectionPredictor()

    if pdf_path:
        from benchmark.utils.bbox import get_pdf_lines
        from surya_tpu.input.load import load_pdf, open_pdf

        doc = open_pdf(pdf_path)
        n_pages = len(doc)
        doc.close()
        images, _ = load_pdf(pdf_path, page_range=list(range(min(max_rows, n_pages))))
        images = convert_if_not_rgb(images)
        correct_boxes = get_pdf_lines(pdf_path, [img.size for img in images])
    elif synthetic:
        images, correct_boxes, _ = synthetic_text_pages(max_rows)
    else:
        dataset = load_hf_dataset(settings.DETECTOR_BENCH_DATASET_NAME, max_rows)
        images = convert_if_not_rgb(list(dataset["image"]))
        correct_boxes = [
            [rescale_bbox(b, (1000, 1000), images[i].size) for b in boxes]
            for i, boxes in enumerate(dataset["bboxes"])
        ]

    det_predictor(images[:1])  # compile
    start = time.time()
    predictions = det_predictor(images)
    surya_time = time.time() - start

    page_metrics = {}
    for idx, (pred, ref) in enumerate(zip(predictions, correct_boxes)):
        surya_boxes = [b.bbox for b in pred.bboxes]
        page_metrics[idx] = {"surya": precision_recall(surya_boxes, ref)}

    mean_metrics = {
        "surya": {
            k: sum(page_metrics[i]["surya"][k] for i in page_metrics) / len(page_metrics)
            for k in ("precision", "recall")
        }
    }
    mean_metrics["surya"]["time_per_image"] = surya_time / len(images)

    if tesseract:
        from benchmark.utils.tesseract import tesseract_parallel

        start = time.time()
        tess_preds = tesseract_parallel(images)
        tess_time = time.time() - start
        for idx, (boxes, ref) in enumerate(zip(tess_preds, correct_boxes)):
            page_metrics[idx]["tesseract"] = precision_recall(boxes, ref)
        mean_metrics["tesseract"] = {
            k: sum(page_metrics[i]["tesseract"][k] for i in page_metrics) / len(page_metrics)
            for k in ("precision", "recall")
        }
        mean_metrics["tesseract"]["time_per_image"] = tess_time / len(images)

    out = {"metrics": mean_metrics, "page_metrics": page_metrics}
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "det_bench.json"), "w") as f:
        json.dump(out, f, indent=2)

    rows = [
        [m, mean_metrics[m]["precision"], mean_metrics[m]["recall"], mean_metrics[m]["time_per_image"]]
        for m in mean_metrics
    ]
    print(tabulate(rows, headers=["model", "precision", "recall", "time/image (s)"]))


if __name__ == "__main__":
    main()
