"""Layout benchmark (reference: benchmark/layout.py). Per-label coverage
precision/recall on vikp/publaynet_bench."""

import collections
import json
import os
import time

import click
from tabulate import tabulate

from benchmark.utils.data import load_hf_dataset, synthetic_text_pages
from benchmark.utils.metrics import precision_recall
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.layout import LayoutPredictor
from surya_tpu.settings import settings

# publaynet label -> our label set
LABEL_ALIGNMENT = {
    "Image": ["Picture", "Figure"],
    "Table": ["Table", "Form", "TableOfContents"],
    "Text": ["Text", "Caption", "Footnote", "Equation", "TextInlineMath", "Code", "Handwriting"],
    "List": ["ListItem"],
    "Title": ["SectionHeader", "Title"],
}


@click.command(help="Benchmark the layout model.")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=100)
@click.option("--synthetic", is_flag=True, default=False, help="Use synthetic pages (no dataset download).")
def main(results_dir: str, max_rows: int, synthetic: bool):
    layout_predictor = LayoutPredictor()
    if synthetic:
        images, page_boxes, _ = synthetic_text_pages(max_rows)
        rows = [{"bboxes": b, "labels": ["Text"] * len(b)} for b in page_boxes]
    else:
        rows = load_hf_dataset(settings.LAYOUT_BENCH_DATASET_NAME, max_rows)
        images = convert_if_not_rgb(list(rows["image"]))

    layout_predictor(images[:1])  # compile
    start = time.time()
    predictions = layout_predictor(images)
    surya_time = time.time() - start

    label_metrics = collections.defaultdict(list)
    for pred, row in zip(predictions, rows):
        for label_name, aliases in LABEL_ALIGNMENT.items():
            ref_boxes = [b for b, lab in zip(row["bboxes"], row["labels"]) if lab == label_name]
            pred_boxes = [p.bbox for p in pred.bboxes if p.label in aliases]
            if ref_boxes or pred_boxes:
                label_metrics[label_name].append(precision_recall(pred_boxes, ref_boxes, penalize_double=False))

    mean_metrics = {
        label: {
            "precision": sum(m["precision"] for m in ms) / len(ms),
            "recall": sum(m["recall"] for m in ms) / len(ms),
        }
        for label, ms in label_metrics.items()
        if ms
    }

    out = {"metrics": mean_metrics, "time_per_image": surya_time / len(images)}
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "layout_bench.json"), "w") as f:
        json.dump(out, f, indent=2)

    print(tabulate(
        [[label, m["precision"], m["recall"]] for label, m in mean_metrics.items()],
        headers=["label", "precision", "recall"],
    ))
    print(f"time per image: {surya_time / len(images):.3f}s")


if __name__ == "__main__":
    main()
