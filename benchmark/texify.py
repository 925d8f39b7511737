"""LaTeX OCR (texify) benchmark (reference: benchmark/texify.py). Normalized
edit distance on datalab-to/texify_bench."""

import json
import os
import time

import click
from rapidfuzz.distance import Levenshtein

from benchmark.utils.data import load_hf_dataset, synthetic_text_pages
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.recognition.tokenizer import TaskNames
from surya_tpu.settings import settings


def normalized_edit_distance(pred: str, ref: str) -> float:
    if not ref:
        return 0.0
    return Levenshtein.distance(pred, ref) / max(len(pred), len(ref))


@click.command(help="Benchmark LaTeX OCR (texify task).")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=128)
@click.option("--synthetic", is_flag=True, default=False, help="Use synthetic blocks (no dataset download).")
def main(results_dir: str, max_rows: int, synthetic: bool):
    predictor = RecognitionPredictor()
    if synthetic:
        images, _, texts = synthetic_text_pages(max_rows, lines=3, size=(800, 260))
        references = [" ".join(t) for t in texts]
    else:
        dataset = load_hf_dataset(settings.TEXIFY_BENCHMARK_DATASET, max_rows)
        images = convert_if_not_rgb(list(dataset["image"]))
        references = list(dataset["text"])

    tasks = [TaskNames.block_without_boxes] * len(images)
    bboxes = [[[0, 0, im.width, im.height]] for im in images]

    predictor(images[:1], tasks[:1], bboxes=bboxes[:1])  # compile
    start = time.time()
    predictions = predictor(images, tasks, bboxes=bboxes)
    total_time = time.time() - start

    dists = [
        normalized_edit_distance(pred.text_lines[0].text, ref)
        for pred, ref in zip(predictions, references)
    ]
    mean_dist = sum(dists) / len(dists)

    out = {"scores": mean_dist, "total_time": total_time, "n": len(images)}
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "texify_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"normalized edit distance: {mean_dist:.4f} ({total_time:.1f}s total, {len(images)} rows)")


if __name__ == "__main__":
    main()
