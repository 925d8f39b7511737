"""surya_table CLI (behavior parity: surya/scripts/table_recognition.py:26-132).

Layout finds the tables, the highres page supplies the crops, table rec runs
once over the flat crop batch, and results group back per document with
page/table indices.
"""

import copy
import json
import os
from collections import Counter, defaultdict

import click

from surya_tpu.common.util import expand_bbox, rescale_bbox
from surya_tpu.debug.draw import draw_bboxes_on_image
from surya_tpu.layout import LayoutPredictor
from surya_tpu.logging import get_logger
from surya_tpu.scripts.config import CLILoader
from surya_tpu.table_rec import TableRecPredictor

logger = get_logger()

TABLE_LABELS = ("Table", "TableOfContents")


def crop_tables(loader, layout_predictions, skip_table_detection):
    """Flatten every page's table regions into one crop batch, keeping the
    page index of each crop. With --skip_table_detection each highres page IS
    the table."""
    crops, crop_pages = [], []
    for page_idx, layout_pred in enumerate(layout_predictions):
        highres = loader.highres_images[page_idx]
        if skip_table_detection:
            crops.append(highres)
            crop_pages.append(page_idx)
            continue
        lowres_size = loader.images[page_idx].size
        for box in layout_pred.bboxes:
            if box.label not in TABLE_LABELS:
                continue
            highres_bbox = expand_bbox(rescale_bbox(box.bbox, lowres_size, highres.size))
            crops.append(highres.crop(highres_bbox))
            crop_pages.append(page_idx)
    return crops, crop_pages


def save_debug_images(crop, pred, result_path, name, page, table_idx):
    rc_image = draw_bboxes_on_image(
        [r.bbox for r in pred.rows], copy.deepcopy(crop),
        labels=[f"Row {r.row_id}" for r in pred.rows], label_font_size=20, color="blue",
    )
    rc_image = draw_bboxes_on_image(
        [c.bbox for c in pred.cols], rc_image,
        labels=[f"Col {c.col_id}" for c in pred.cols], label_font_size=20, color="red",
    )
    rc_image.save(os.path.join(result_path, f"{name}_page{page}_table{table_idx}_rc.png"))
    cell_image = draw_bboxes_on_image([c.bbox for c in pred.cells], copy.deepcopy(crop), color="green")
    cell_image.save(os.path.join(result_path, f"{name}_page{page}_table{table_idx}_cells.png"))


@click.command(help="Detect and recognize table structure in an input file or folder.")
@CLILoader.common_options
@click.option(
    "--skip_table_detection",
    is_flag=True,
    help="Tables are already cropped, so don't re-detect tables.",
    default=False,
)
def table_recognition_cli(input_path: str, skip_table_detection: bool, **kwargs):
    loader = CLILoader(input_path, kwargs, highres=True)

    layout_predictor = LayoutPredictor()
    table_rec_predictor = TableRecPredictor()

    layout_predictions = layout_predictor(loader.images)
    crops, crop_pages = crop_tables(loader, layout_predictions, skip_table_detection)
    table_preds = table_rec_predictor(crops)

    # page numbers restart at 1 within each document name (a PDF's pages
    # share one name; results.json is keyed by document)
    pages_seen: Counter = Counter()
    page_number = []
    for name in loader.names:
        pages_seen[name] += 1
        page_number.append(pages_seen[name])

    results = defaultdict(list)
    tables_on_page: Counter = Counter()
    for crop, page_idx, pred in zip(crops, crop_pages, table_preds):
        name = loader.names[page_idx]
        table_idx = tables_on_page[page_idx]
        tables_on_page[page_idx] += 1

        out_pred = pred.model_dump()
        out_pred["page"] = page_number[page_idx]
        out_pred["table_idx"] = table_idx
        results[name].append(out_pred)

        if loader.save_images:
            save_debug_images(crop, pred, loader.result_path, name, page_number[page_idx], table_idx)

    with open(os.path.join(loader.result_path, "results.json"), "w+", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False)
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    table_recognition_cli()
