"""PDF ground-truth line boxes for the detection benchmark (reference:
benchmark/utils/bbox.py). Extracts embedded text-line bboxes from a PDF and
joins vertically-adjacent fragments, so a real PDF can serve as detection
ground truth. PDF text extraction is optional (pypdfium2)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

from surya_tpu.common.util import rescale_bbox

Box = Tuple[float, float, float, float]


def get_pdf_lines(pdf_path: str, img_sizes: Sequence[Tuple[int, int]]) -> List[List[Box]]:
    """Embedded text-line boxes per page, rescaled to the rendered image
    sizes. Uses pypdfium2 (the same renderer the input layer uses); line
    granularity is approximated by joining same-baseline char runs."""
    try:
        import pypdfium2 as pdfium
    except ImportError as e:
        raise ImportError("get_pdf_lines needs pypdfium2") from e

    doc = pdfium.PdfDocument(pdf_path)
    page_lines: List[List[Box]] = []
    try:
        for idx, img_size in enumerate(img_sizes):
            page = doc[idx]
            textpage = page.get_textpage()
            n = textpage.count_rects()
            pw, ph = page.get_size()
            boxes = []
            for r in range(n):
                l, b, rgt, t = textpage.get_rect(r)
                # pdf origin bottom-left -> image origin top-left
                boxes.append((l, ph - t, rgt, ph - b))
            boxes = join_lines([(i, bx) for i, bx in enumerate(boxes)])
            boxes = [rescale_bbox(list(b), (pw, ph), img_size) for b in boxes]
            page_lines.append(boxes)
    finally:
        doc.close()
    return page_lines


def merge_boxes(box1: Box, box2: Box) -> Box:
    return (
        min(box1[0], box2[0]), min(box1[1], box2[1]),
        max(box1[2], box2[2]), max(box1[3], box2[3]),
    )


def join_lines(bboxes: List[Tuple[int, Box]], max_gap: float = 5) -> List[Box]:
    """Merge a box with any box directly below it (vertical gap <= max_gap,
    horizontally contained) — same fragment-joining rule as the reference."""
    to_merge = {}
    for i, box1 in bboxes:
        for j, box2 in bboxes[i + 1 :]:
            if box1 == box2:
                continue
            if box1[0] <= box2[0] and box1[2] >= box2[2]:
                if abs(box1[1] - box2[3]) <= max_gap:
                    to_merge.setdefault(i, []).append(j)

    merged_boxes = set()
    merged = []
    for i, box in bboxes:
        if i in merged_boxes:
            continue
        if i in to_merge:
            for j in to_merge[i]:
                box = merge_boxes(box, bboxes[j][1])
                merged_boxes.add(j)
        merged.append(box)
    return merged
