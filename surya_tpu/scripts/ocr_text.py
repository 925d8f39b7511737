"""surya_ocr CLI (reference: surya/scripts/ocr_text.py)."""

import json
import os
import time
from collections import defaultdict

import click

from surya_tpu.debug.draw import draw_text_on_image
from surya_tpu.detection import DetectionPredictor
from surya_tpu.logging import get_logger
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.recognition.tokenizer import TaskNames
from surya_tpu.scripts.config import CLILoader

logger = get_logger()


@click.command(help="OCR text in an input file or folder (PDFs or images).")
@click.option("--task_name", type=str, default=TaskNames.ocr_with_boxes)
@click.option("--disable_math", is_flag=True, default=False, help="Do not recognize math in OCR.")
@CLILoader.common_options
def ocr_text_cli(input_path: str, task_name: str, disable_math: bool, **kwargs):
    loader = CLILoader(input_path, kwargs, highres=True)
    task_names = [task_name] * len(loader.images)

    det_predictor = DetectionPredictor()
    rec_predictor = RecognitionPredictor()

    start = time.time()
    predictions_by_image = rec_predictor(
        loader.images,
        task_names=task_names,
        det_predictor=det_predictor,
        highres_images=loader.highres_images,
        math_mode=not disable_math,
    )
    if loader.debug:
        logger.debug("OCR took %.2f seconds", time.time() - start)

    if loader.save_images:
        for idx, (name, image, pred) in enumerate(zip(loader.names, loader.images, predictions_by_image)):
            bboxes = [line.bbox for line in pred.text_lines]
            pred_text = [line.text for line in pred.text_lines]
            page_image = draw_text_on_image(bboxes, pred_text, image.size)
            page_image.save(os.path.join(loader.result_path, f"{name}_{idx}_text.png"))

    out_preds = defaultdict(list)
    for name, pred in zip(loader.names, predictions_by_image):
        out_pred = pred.model_dump()
        out_pred["page"] = len(out_preds[name]) + 1
        out_preds[name].append(out_pred)

    with open(os.path.join(loader.result_path, "results.json"), "w+", encoding="utf-8") as f:
        json.dump(out_preds, f, ensure_ascii=False)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    ocr_text_cli()
