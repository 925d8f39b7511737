"""surya_layout CLI. Flags and the results.json layout are the drop-in
contract with the reference CLI (surya/scripts/detect_layout.py); the body is
built on this package's shared artifact/result helpers."""

import copy
import time

import click

from surya_tpu.debug.draw import draw_polys_on_image
from surya_tpu.layout import LayoutPredictor
from surya_tpu.logging import get_logger
from surya_tpu.scripts.config import CLILoader, save_page_artifacts, write_results_json

logger = get_logger()


@click.command(help="Detect layout of an input file or folder (PDFs or images).")
@CLILoader.common_options
def detect_layout_cli(input_path: str, **kwargs):
    loader = CLILoader(input_path, kwargs)
    predictor = LayoutPredictor()  # constructed OUTSIDE the timed region

    start = time.time()
    predictions = predictor(loader.images)
    if loader.debug:
        logger.debug("Layout took %.2f seconds", time.time() - start)

    def render(image, pred):
        polys = [p.polygon for p in pred.bboxes]
        labels = [f"{p.label}-{p.position}" for p in pred.bboxes]
        yield "layout", draw_polys_on_image(polys, copy.deepcopy(image), labels=labels)

    save_page_artifacts(loader, predictions, render)
    write_results_json(loader.result_path, loader.names, predictions)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    detect_layout_cli()
