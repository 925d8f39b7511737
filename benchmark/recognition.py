"""Recognition benchmark (reference: benchmark/recognition.py). Fuzzy line
similarity on vikp/rec_bench (or synthetic pages offline)."""

import json
import os
import time

import click
from tabulate import tabulate

from benchmark.utils.data import load_hf_dataset, synthetic_text_pages
from benchmark.utils.scoring import overlap_score
from surya_tpu.input.processing import convert_if_not_rgb
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.settings import settings


@click.command(help="Benchmark the recognition model.")
@click.option("--results_dir", type=str, default=os.path.join(settings.RESULT_DIR, "benchmark"))
@click.option("--max_rows", type=int, default=256)
@click.option("--synthetic", is_flag=True, default=False)
@click.option("--tesseract", is_flag=True, default=False, help="Also run the tesseract baseline.")
@click.option("--tess_cpus", type=int, default=None, help="Worker processes for tesseract.")
@click.option("--textract", is_flag=True, default=False, help="Also run the AWS Textract baseline.")
@click.option("--textract_cpus", type=int, default=None, help="Worker threads for textract.")
def main(results_dir: str, max_rows: int, synthetic: bool, tesseract: bool, tess_cpus, textract: bool, textract_cpus):
    rec_predictor = RecognitionPredictor()

    languages = None
    if synthetic:
        images, bboxes, line_text = synthetic_text_pages(max_rows)
    else:
        dataset = load_hf_dataset(settings.RECOGNITION_BENCH_DATASET_NAME, max_rows)
        images = convert_if_not_rgb(list(dataset["image"]))
        bboxes = list(dataset["bboxes"])
        line_text = list(dataset["text"])
        if "language" in dataset.column_names:
            languages = list(dataset["language"])

    rec_predictor(images[:1], bboxes=bboxes[:1])  # compile
    start = time.time()
    predictions = rec_predictor(images, bboxes=bboxes)
    surya_time = time.time() - start

    scores, weights = [], []
    for pred, ref_texts in zip(predictions, line_text):
        pred_texts = [line.text for line in pred.text_lines]
        s, w, _ = overlap_score(pred_texts, ref_texts)
        scores.extend(s)
        weights.extend(w)
    avg_score = sum(scores) / max(1e-6, sum(weights))

    out = {
        "surya": {
            "avg_score": avg_score,
            "time_per_img": surya_time / len(images),
            "total_time": surya_time,
        }
    }

    if tesseract:
        from benchmark.utils.tesseract import surya_lang_to_tesseract, tesseract_ocr_parallel

        langs = languages or [["en"]] * len(images)
        keep, tess_langs = [], []
        for i, lang in enumerate(langs):
            code = surya_lang_to_tesseract(lang[0] if isinstance(lang, (list, tuple)) else lang)
            if code is not None:
                keep.append(i)
                tess_langs.append(code)
        start = time.time()
        tess_predictions = tesseract_ocr_parallel(
            [images[i] for i in keep], [bboxes[i] for i in keep], tess_langs, cpus=tess_cpus
        )
        tess_time = time.time() - start
        t_scores, t_weights = [], []
        for pred_texts, i in zip(tess_predictions, keep):
            s, w, _ = overlap_score(pred_texts, line_text[i])
            t_scores.extend(s)
            t_weights.extend(w)
        out["tesseract"] = {
            "avg_score": sum(t_scores) / max(1e-6, sum(t_weights)),
            "time_per_img": tess_time / max(1, len(keep)),
            "total_time": tess_time,
        }

    if textract:
        from benchmark.utils.textract import textract_ocr_parallel

        start = time.time()
        textract_predictions = textract_ocr_parallel(images, cpus=textract_cpus)
        textract_time = time.time() - start
        x_scores, x_weights = [], []
        for pred_texts, ref_texts in zip(textract_predictions, line_text):
            s, w, _ = overlap_score([t for t in pred_texts if t], ref_texts)
            x_scores.extend(s)
            x_weights.extend(w)
        out["textract"] = {
            "avg_score": sum(x_scores) / max(1e-6, sum(x_weights)),
            "time_per_img": textract_time / len(images),
            "total_time": textract_time,
        }

    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "rec_bench.json"), "w") as f:
        json.dump(out, f, indent=2)

    rows = [[m, out[m]["avg_score"], out[m]["time_per_img"]] for m in out]
    print(tabulate(rows, headers=["model", "avg_score", "time/image (s)"]))


if __name__ == "__main__":
    main()
