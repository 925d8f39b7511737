"""Shared CLI plumbing.

The option surface (names, defaults, flag semantics) is the drop-in
compatibility contract with the reference CLIs (surya/scripts/config.py:9-62);
the implementation here is organized around a declarative option table and a
pathlib-based input resolver instead of the reference's inline decorators.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import click

from surya_tpu.input.load import load_from_file, load_from_folder
from surya_tpu.settings import settings

# the shared option surface, declaratively: (args, kwargs) per option. These
# names/defaults are the compatibility contract — scripts built against the
# reference CLIs must run unchanged.
_COMMON_OPTIONS = (
    (
        ("--output_dir",),
        dict(
            type=click.Path(exists=False),
            required=False,
            default=str(Path(settings.RESULT_DIR) / "surya"),
            help="Directory to save output.",
        ),
    ),
    (
        ("--page_range",),
        dict(
            type=str,
            default=None,
            help="Page range, comma separated page numbers or ranges. Example: 0,5-10,20",
        ),
    ),
    (("--images",), dict(is_flag=True, default=False, help="Save images of detected bboxes.")),
    (("--debug", "-d"), dict(is_flag=True, default=False, help="Enable debug mode.")),
)


def _expand_range_part(part: str) -> List[int]:
    lo, dash, hi = part.partition("-")
    return list(range(int(lo), int(hi) + 1)) if dash else [int(lo)]


class CLILoader:
    """Resolves a CLI invocation (input path + shared options) into loaded
    page images, optional highres copies, names, and a result directory."""

    def __init__(self, filepath: str, cli_options: dict, highres: bool = False):
        raw_range = cli_options.get("page_range")
        self.page_range = self.parse_range_str(raw_range) if raw_range else raw_range
        self.filepath = filepath
        self.config = cli_options
        self.save_images = cli_options.get("images", False)
        self.debug = cli_options.get("debug", False)
        self.output_dir = cli_options.get("output_dir")
        self.load(highres)

    @staticmethod
    def common_options(fn):
        for args, kwargs in reversed(_COMMON_OPTIONS):
            fn = click.option(*args, **kwargs)(fn)
        return click.argument("input_path", type=click.Path(exists=True), required=True)(fn)

    def _read(self, highres_dpi=None) -> Tuple[list, list]:
        src = Path(self.filepath)
        reader = load_from_folder if src.is_dir() else load_from_file
        if highres_dpi is None:
            return reader(self.filepath, self.page_range)
        return reader(self.filepath, self.page_range, highres_dpi)

    def load(self, highres: bool = False):
        src = Path(self.filepath)
        self.images, self.names = self._read()
        self.highres_images = (
            self._read(settings.IMAGE_DPI_HIGHRES)[0] if highres else None
        )
        run_name = src.name if src.is_dir() else src.name.split(".")[0]
        self.result_path = str((Path(self.output_dir) / run_name).absolute())
        Path(self.result_path).mkdir(parents=True, exist_ok=True)

    @staticmethod
    def parse_range_str(range_str: str) -> List[int]:
        pages = [p for part in range_str.split(",") for p in _expand_range_part(part)]
        return sorted(set(pages))


def write_results_json(result_path: str, names, predictions, exclude=None, to_row=None) -> str:
    """Group per-image predictions into the reference CLIs' results.json
    layout: {input_name: [prediction + 1-based "page", ...]}. `to_row` maps
    a prediction to its dict row (default: pydantic model_dump)."""
    import json
    from collections import defaultdict

    if to_row is None:
        to_row = lambda pred: pred.model_dump(exclude=exclude)  # noqa: E731
    by_name: dict = defaultdict(list)
    for name, pred in zip(names, predictions):
        row = to_row(pred)
        row["page"] = len(by_name[name]) + 1
        by_name[name].append(row)
    out = Path(result_path) / "results.json"
    out.write_text(json.dumps(by_name, ensure_ascii=False), encoding="utf-8")
    return str(out)


def save_page_artifacts(loader, predictions, render) -> None:
    """Render one debug artifact per page when --images was passed.
    `render(image, pred) -> (suffix, PIL image or None) pairs`."""
    if not loader.save_images:
        return
    for idx, (image, pred, name) in enumerate(zip(loader.images, predictions, loader.names)):
        for suffix, artifact in render(image, pred):
            if artifact is not None:
                artifact.save(str(Path(loader.result_path) / f"{name}_{idx}_{suffix}.png"))
