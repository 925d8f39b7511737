"""Recognition output schemas (reference: surya/recognition/schema.py)."""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
from pydantic import BaseModel, field_validator

from surya_tpu.common.polygon import PolygonBox


class BaseChar(PolygonBox):
    text: str
    confidence: Optional[float] = 0

    @field_validator("confidence", mode="before")
    @classmethod
    def _nan_to_zero(cls, v):
        if v is None:
            return 0
        if isinstance(v, float) and (math.isnan(v) or np.isnan(v)):
            return 0
        return v


class TextChar(BaseChar):
    bbox_valid: bool = True


class TextWord(BaseChar):
    bbox_valid: bool = True


class TextLine(BaseChar):
    chars: List[TextChar]
    original_text_good: bool = False
    words: Optional[List[TextWord]] = None


class OCRResult(BaseModel):
    text_lines: List[TextLine]
    image_bbox: List[float]
