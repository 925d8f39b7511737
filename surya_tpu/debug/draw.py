"""Debug visualization helpers (reference: surya/debug/draw.py, debug/text.py)."""

from __future__ import annotations

from typing import List, Optional

from PIL import Image, ImageDraw, ImageFont


def _font(size: int):
    try:
        return ImageFont.truetype(ImageFont.load_default().path, size)  # pragma: no cover
    except Exception:
        try:
            return ImageFont.load_default(size=size)
        except TypeError:
            return ImageFont.load_default()


def draw_bboxes_on_image(bboxes, image, labels=None, label_font_size=10, color="red"):
    polys = [[[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]] for b in bboxes]
    return draw_polys_on_image(polys, image, labels, label_font_size=label_font_size, color=color)


def draw_polys_on_image(corners, image, labels=None, label_offset=1, label_font_size=10, color="red"):
    draw = ImageDraw.Draw(image)
    font = _font(label_font_size)
    for i, poly in enumerate(corners):
        pts = [(int(p[0]), int(p[1])) for p in poly]
        c = color[i] if isinstance(color, list) else color
        draw.polygon(pts, outline=c, width=1)
        if labels is not None:
            x = min(p[0] for p in pts) + label_offset
            y = min(p[1] for p in pts) + label_offset
            bbox = draw.textbbox((x, y), labels[i], font=font)
            draw.rectangle(bbox, fill="white")
            draw.text((x, y), labels[i], fill=c, font=font)
    return image


def draw_text_on_image(bboxes, texts: List[str], image_size, max_font_size: int = 60) -> Image.Image:
    """Re-render recognized text into an empty page (reference debug/text.py:71)."""
    image = Image.new("RGB", image_size, "white")
    draw = ImageDraw.Draw(image)
    for bbox, text in zip(bboxes, texts):
        if not text:
            continue
        height = max(6, int((bbox[3] - bbox[1]) * 0.9))
        font = _font(min(height, max_font_size))
        draw.text((bbox[0], bbox[1]), text, fill="black", font=font)
    return image
