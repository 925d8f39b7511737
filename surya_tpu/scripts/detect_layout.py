"""surya_layout CLI (reference: surya/scripts/detect_layout.py)."""

import copy
import json
import os
import time
from collections import defaultdict

import click

from surya_tpu.debug.draw import draw_polys_on_image
from surya_tpu.layout import LayoutPredictor
from surya_tpu.logging import get_logger
from surya_tpu.scripts.config import CLILoader

logger = get_logger()


@click.command(help="Detect layout of an input file or folder (PDFs or images).")
@CLILoader.common_options
def detect_layout_cli(input_path: str, **kwargs):
    loader = CLILoader(input_path, kwargs)
    layout_predictor = LayoutPredictor()

    start = time.time()
    layout_predictions = layout_predictor(loader.images)
    if loader.debug:
        logger.debug("Layout took %.2f seconds", time.time() - start)

    if loader.save_images:
        for idx, (image, layout_pred, name) in enumerate(zip(loader.images, layout_predictions, loader.names)):
            polygons = [p.polygon for p in layout_pred.bboxes]
            labels = [f"{p.label}-{p.position}" for p in layout_pred.bboxes]
            bbox_image = draw_polys_on_image(polygons, copy.deepcopy(image), labels=labels)
            bbox_image.save(os.path.join(loader.result_path, f"{name}_{idx}_layout.png"))

    predictions_by_page = defaultdict(list)
    for pred, name in zip(layout_predictions, loader.names):
        out_pred = pred.model_dump()
        out_pred["page"] = len(predictions_by_page[name]) + 1
        predictions_by_page[name].append(out_pred)

    with open(os.path.join(loader.result_path, "results.json"), "w+", encoding="utf-8") as f:
        json.dump(predictions_by_page, f, ensure_ascii=False)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    detect_layout_cli()
