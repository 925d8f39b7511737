"""surya_latex_ocr CLI. Flags and the results.json layout are the drop-in
contract with the reference CLI (surya/scripts/ocr_latex.py)."""

import json
import time
from pathlib import Path

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

    start = time.time()
    results = RecognitionPredictor()(
        loader.images,
        [TaskNames.block_without_boxes] * len(loader.images),
        bboxes=[[[0, 0, im.width, im.height]] for im in loader.images],
    )
    if loader.debug:
        logger.debug("LaTeX OCR took %.2f seconds", time.time() - start)

    # one whole-image equation per page, grouped by input name with 1-based
    # page numbers (the shared write_results_json handles schema objects;
    # this output is plain strings, so it is assembled directly)
    grouped: dict = {}
    for name, pred in zip(loader.names, results):
        rows = grouped.setdefault(name, [])
        rows.append({"equation": pred.text_lines[0].text, "page": len(rows) + 1})
    out = Path(loader.result_path) / "results.json"
    out.write_text(json.dumps(grouped, ensure_ascii=False), encoding="utf-8")
    logger.info("Wrote results to %s", loader.result_path)


if __name__ == "__main__":
    ocr_latex_cli()
