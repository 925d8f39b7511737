"""surya_latex_ocr CLI (reference: surya/scripts/ocr_latex.py)."""

import json
import os
import time
from collections import defaultdict

import click

from surya_tpu.logging import get_logger
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.recognition.tokenizer import TaskNames
from surya_tpu.scripts.config import CLILoader

logger = get_logger()


@click.command(help="OCR LaTeX equations (texify).")
@CLILoader.common_options
def ocr_latex_cli(input_path: str, **kwargs):
    loader = CLILoader(input_path, kwargs, highres=True)

    texify_predictor = RecognitionPredictor()
    tasks = [TaskNames.block_without_boxes] * len(loader.images)
    bboxes = [[[0, 0, image.width, image.height]] for image in loader.images]

    start = time.time()
    predictions_by_image = texify_predictor(loader.images, tasks, bboxes=bboxes)
    latex_predictions = [p.text_lines[0].text for p in predictions_by_image]
    if loader.debug:
        logger.debug("LaTeX OCR took %.2f seconds", time.time() - start)

    out_preds = defaultdict(list)
    for name, pred in zip(loader.names, latex_predictions):
        out_preds[name].append({"equation": pred, "page": len(out_preds[name]) + 1})

    with open(os.path.join(loader.result_path, "results.json"), "w+", encoding="utf-8") as f:
        json.dump(out_preds, f, ensure_ascii=False)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    ocr_latex_cli()
