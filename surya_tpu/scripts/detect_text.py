"""surya_detect CLI. Flags and the results.json layout are the drop-in
contract with the reference CLI (surya/scripts/detect_text.py); the body is
built on this package's shared artifact/result helpers."""

import copy
import time

import click

from surya_tpu.debug.draw import draw_polys_on_image
from surya_tpu.detection import DetectionPredictor
from surya_tpu.logging import get_logger
from surya_tpu.scripts.config import CLILoader, save_page_artifacts, write_results_json

logger = get_logger()


@click.command(help="Detect text line bboxes in an input file or folder (PDFs or images).")
@CLILoader.common_options
def detect_text_cli(input_path: str, **kwargs):
    loader = CLILoader(input_path, kwargs)
    predictor = DetectionPredictor()  # constructed OUTSIDE the timed region

    start = time.time()
    predictions = predictor(loader.images, include_maps=loader.debug)
    if loader.debug:
        logger.debug("Detection took %.2f seconds", time.time() - start)

    def render(image, pred):
        polys = [p.polygon for p in pred.bboxes]
        yield "bbox", draw_polys_on_image(polys, copy.deepcopy(image))
        if loader.debug:
            yield "heat", pred.heatmap

    save_page_artifacts(loader, predictions, render)
    write_results_json(
        loader.result_path, loader.names, predictions, exclude=["heatmap", "affinity_map"]
    )
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    detect_text_cli()
