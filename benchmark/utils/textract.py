"""AWS Textract competitor baseline for the recognition benchmark
(reference: benchmark/utils/textract.py). The textractor client and AWS
credentials are optional — a clear ImportError is raised when absent."""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

from tqdm import tqdm


def _require_textractor():
    try:
        from textractor import Textractor  # optional dependency

        return Textractor
    except ImportError as e:
        raise ImportError(
            "the textract baseline needs amazon-textract-textractor and AWS "
            "credentials (pip install amazon-textract-textractor)"
        ) from e


def textract_ocr(extractor, img) -> List[Optional[str]]:
    """Full-page OCR through the Textract API; one call per image."""
    try:
        document = extractor.detect_document_text(file_source=img)
        return [line.text for line in document.lines]
    except Exception:
        traceback.print_exc()
        return [None]


def textract_ocr_parallel(imgs, cpus: Optional[int] = None) -> List[List[Optional[str]]]:
    """API-bound, so thread (not process) parallelism like the reference."""
    Textractor = _require_textractor()
    extractor = Textractor(profile_name="default")
    workers = min(len(imgs), cpus or os.cpu_count() or 1)
    with ThreadPoolExecutor(max_workers=workers) as executor:
        return list(
            tqdm(
                executor.map(textract_ocr, [extractor] * len(imgs), imgs),
                total=len(imgs), desc="Running textract OCR",
            )
        )
