"""surya_ocr CLI. Flags and the results.json layout are the drop-in contract
with the reference CLI (surya/scripts/ocr_text.py); the body is built on this
package's shared artifact/result helpers."""

import time

import click

from surya_tpu.debug.draw import draw_text_on_image
from surya_tpu.detection import DetectionPredictor
from surya_tpu.logging import get_logger
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.recognition.tokenizer import TaskNames
from surya_tpu.scripts.config import CLILoader, save_page_artifacts, write_results_json

logger = get_logger()


@click.command(help="OCR text in an input file or folder (PDFs or images).")
@click.option("--task_name", type=str, default=TaskNames.ocr_with_boxes)
@click.option("--disable_math", is_flag=True, default=False, help="Do not recognize math in OCR.")
@CLILoader.common_options
def ocr_text_cli(input_path: str, task_name: str, disable_math: bool, **kwargs):
    loader = CLILoader(input_path, kwargs, highres=True)
    rec_predictor = RecognitionPredictor()  # constructed OUTSIDE the timed region
    det_predictor = DetectionPredictor()

    start = time.time()
    predictions = rec_predictor(
        loader.images,
        task_names=[task_name] * len(loader.images),
        det_predictor=det_predictor,
        highres_images=loader.highres_images,
        math_mode=not disable_math,
    )
    if loader.debug:
        logger.debug("OCR took %.2f seconds", time.time() - start)

    def render(image, pred):
        lines = pred.text_lines
        yield "text", draw_text_on_image(
            [ln.bbox for ln in lines], [ln.text for ln in lines], image.size
        )

    save_page_artifacts(loader, predictions, render)
    write_results_json(loader.result_path, loader.names, predictions)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    ocr_text_cli()
