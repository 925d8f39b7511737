"""surya_detect CLI (reference: surya/scripts/detect_text.py)."""

import copy
import json
import os
import time
from collections import defaultdict

import click

from surya_tpu.debug.draw import draw_polys_on_image
from surya_tpu.detection import DetectionPredictor
from surya_tpu.logging import get_logger
from surya_tpu.scripts.config import CLILoader

logger = get_logger()


@click.command(help="Detect text line bboxes in an input file or folder (PDFs or images).")
@CLILoader.common_options
def detect_text_cli(input_path: str, **kwargs):
    loader = CLILoader(input_path, kwargs)
    det_predictor = DetectionPredictor()

    start = time.time()
    predictions = det_predictor(loader.images, include_maps=loader.debug)
    if loader.debug:
        logger.debug("Detection took %.2f seconds", time.time() - start)

    if loader.save_images:
        for idx, (image, pred, name) in enumerate(zip(loader.images, predictions, loader.names)):
            polygons = [p.polygon for p in pred.bboxes]
            bbox_image = draw_polys_on_image(polygons, copy.deepcopy(image))
            bbox_image.save(os.path.join(loader.result_path, f"{name}_{idx}_bbox.png"))
            if loader.debug and pred.heatmap is not None:
                pred.heatmap.save(os.path.join(loader.result_path, f"{name}_{idx}_heat.png"))

    predictions_by_page = defaultdict(list)
    for pred, name in zip(predictions, loader.names):
        out_pred = pred.model_dump(exclude=["heatmap", "affinity_map"])
        out_pred["page"] = len(predictions_by_page[name]) + 1
        predictions_by_page[name].append(out_pred)

    with open(os.path.join(loader.result_path, "results.json"), "w+", encoding="utf-8") as f:
        json.dump(predictions_by_page, f, ensure_ascii=False)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    detect_text_cli()
