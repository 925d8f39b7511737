"""Layout output schemas (reference: surya/layout/schema.py)."""

from typing import Dict, List, Optional

from pydantic import BaseModel

from surya_tpu.common.polygon import PolygonBox


class LayoutBox(PolygonBox):
    label: str
    position: int
    top_k: Optional[Dict[str, float]] = None


class LayoutResult(BaseModel):
    bboxes: List[LayoutBox]
    image_bbox: List[float]
    sliced: bool = False
