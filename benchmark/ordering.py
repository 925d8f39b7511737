"""Reading order benchmark (reference: benchmark/ordering.py). Pairwise rank
accuracy of layout emission order on vikp/order_bench."""

import json
import os
import time

import click

from benchmark.utils.data import load_hf_dataset, synthetic_text_pages
from benchmark.utils.metrics import rank_accuracy
from surya_tpu.common.polygon import PolygonBox
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.layout import LayoutPredictor
from surya_tpu.settings import settings


@click.command(help="Benchmark reading order (layout emission order).")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=100)
@click.option("--synthetic", is_flag=True, default=False, help="Use synthetic pages (no dataset download).")
def main(results_dir: str, max_rows: int, synthetic: bool):
    layout_predictor = LayoutPredictor()
    if synthetic:
        # natural top-to-bottom reading order on synthetic line pages
        images, page_boxes, _ = synthetic_text_pages(max_rows)
        rows = [
            {"bboxes": b, "labels": [str(i) for i in range(len(b))]} for b in page_boxes
        ]
    else:
        rows = load_hf_dataset(settings.ORDER_BENCH_DATASET_NAME, max_rows)
        images = convert_if_not_rgb(list(rows["image"]))

    layout_predictor(images[:1])  # compile
    start = time.time()
    predictions = layout_predictor(images)
    total_time = time.time() - start

    accuracies = []
    for pred, row in zip(predictions, rows):
        # match each reference box to the closest predicted box's position
        pred_positions = []
        ref_positions = []
        for ref_bbox, ref_pos in zip(row["bboxes"], row["labels"]):
            ref_box = PolygonBox(polygon=ref_bbox)
            best, best_pos = 0.0, None
            for p in pred.bboxes:
                pct = ref_box.intersection_pct(p)
                if pct > best:
                    best, best_pos = pct, p.position
            if best_pos is not None:
                pred_positions.append(best_pos)
                ref_positions.append(int(ref_pos))
        if len(pred_positions) > 1:
            accuracies.append(rank_accuracy(pred_positions, ref_positions))

    mean_accuracy = sum(accuracies) / len(accuracies) if accuracies else 0.0
    out = {"mean_accuracy": mean_accuracy, "time_per_image": total_time / len(images)}
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "order_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"mean pairwise order accuracy: {mean_accuracy:.4f} ({total_time / len(images):.3f}s/image)")


if __name__ == "__main__":
    main()
