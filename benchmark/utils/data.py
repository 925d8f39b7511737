"""Benchmark data loading: HF datasets when reachable, synthetic pages with
exact ground truth otherwise (this environment has no network egress)."""

from __future__ import annotations

from typing import List, Tuple

from PIL import Image, ImageDraw

from surya_tpu.logging import get_logger

logger = get_logger()


def load_hf_dataset(name: str, max_rows: int):
    import datasets

    return datasets.load_dataset(name, split=f"train[:{max_rows}]")


def synthetic_text_pages(n: int, lines: int = 12, size=(1024, 1024)) -> Tuple[List[Image.Image], List[List[List[int]]], List[List[str]]]:
    """Pages of horizontal text lines with exact line bboxes + strings."""
    images, all_boxes, all_texts = [], [], []
    for p in range(n):
        img = Image.new("RGB", size, "white")
        draw = ImageDraw.Draw(img)
        boxes, texts = [], []
        for i in range(lines):
            text = f"Synthetic page {p} line {i} of benchmark text."
            y = 40 + i * 70
            draw.text((50, y), text, fill="black", font_size=28)
            bbox = draw.textbbox((50, y), text, font_size=28)
            boxes.append([int(v) for v in bbox])
            texts.append(text)
        images.append(img)
        all_boxes.append(boxes)
        all_texts.append(texts)
    return images, all_boxes, all_texts


def synthetic_table_pages(n: int, rows: int = 4, cols: int = 3, size=(800, 600)):
    """Grid tables with exact row/col bboxes."""
    images, all_rows, all_cols = [], [], []
    cell_w, cell_h = size[0] // cols, size[1] // rows
    for p in range(n):
        img = Image.new("RGB", size, "white")
        draw = ImageDraw.Draw(img)
        for r in range(rows):
            for c in range(cols):
                draw.rectangle(
                    (c * cell_w + 4, r * cell_h + 4, (c + 1) * cell_w - 4, (r + 1) * cell_h - 4),
                    outline="black",
                )
                draw.text((c * cell_w + 14, r * cell_h + 16), f"r{r}c{c}", fill="black", font_size=20)
        images.append(img)
        all_rows.append([[0, r * cell_h, size[0], (r + 1) * cell_h] for r in range(rows)])
        all_cols.append([[c * cell_w, 0, (c + 1) * cell_w, size[1]] for c in range(cols)])
    return images, all_rows, all_cols
