"""surya_latex_ocr CLI. Flags and the results.json layout are the drop-in
contract with the reference CLI (surya/scripts/ocr_latex.py)."""

import time

import click

from surya_tpu.logging import get_logger
from surya_tpu.recognition import RecognitionPredictor
from surya_tpu.recognition.tokenizer import TaskNames
from surya_tpu.scripts.config import CLILoader, write_results_json

logger = get_logger()


@click.command(help="OCR LaTeX equations (texify).")
@CLILoader.common_options
def ocr_latex_cli(input_path: str, **kwargs):
    # NOTE: unlike the reference CLI, the pages are NOT rasterized a second
    # time at highres — the reference loads highres copies it never feeds to
    # the model (surya/scripts/ocr_latex.py:20-31), doubling PDF load time
    loader = CLILoader(input_path, kwargs)
    predictor = RecognitionPredictor()

    start = time.time()
    results = predictor(
        loader.images,
        [TaskNames.block_without_boxes] * len(loader.images),
        bboxes=[[[0, 0, im.width, im.height]] for im in loader.images],
    )
    if loader.debug:
        logger.debug("LaTeX OCR took %.2f seconds", time.time() - start)

    write_results_json(
        loader.result_path, loader.names, results,
        to_row=lambda pred: {"equation": pred.text_lines[0].text},
    )
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    ocr_latex_cli()
