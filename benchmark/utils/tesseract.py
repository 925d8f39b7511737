"""Tesseract competitor baseline for the detection/recognition benchmarks
(reference: benchmark/utils/tesseract.py) — makes the benchmark tables
apples-to-apples with the reference README's competitor rows.

pytesseract + the tesseract binary are optional; every entry point raises a
clear ImportError when they're absent. On this single-core host the process
pool degenerates to one worker — sizing logic mirrors the reference
(tesseract itself uses up to 4 threads per instance)."""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional

import numpy as np
from tqdm import tqdm

from surya_tpu.input.processing import slice_bboxes_from_image
from surya_tpu.recognition.languages import CODE_TO_LANGUAGE
from surya_tpu.settings import settings


def _require_pytesseract():
    try:
        import pytesseract  # noqa: F401

        return pytesseract
    except ImportError as e:
        raise ImportError(
            "the tesseract baseline needs pytesseract and the tesseract "
            "binary (pip install pytesseract; apt install tesseract-ocr)"
        ) from e


def surya_lang_to_tesseract(code: str) -> Optional[str]:
    """Map a surya language code to tesseract's traineddata code (None for
    unknown/unsupported codes — callers skip those rows)."""
    lang_str = CODE_TO_LANGUAGE.get(code)
    if lang_str is None:
        return None
    return TESS_LANGUAGE_TO_CODE.get(lang_str)


def _tess_config() -> str:
    prefix = settings.TESSDATA_PREFIX
    return f'--tessdata-dir "{prefix}"' if prefix else ""


def tesseract_ocr(img, bboxes, lang: str) -> List[str]:
    """OCR each line crop (same slicing as the surya pipeline uses)."""
    pytesseract = _require_pytesseract()
    arr = np.asarray(img.convert("RGB"), np.float32)
    line_imgs = slice_bboxes_from_image(arr, bboxes)
    return [
        pytesseract.image_to_string(
            np.clip(line_img, 0, 255).astype(np.uint8), lang=lang, config=_tess_config()
        )
        for line_img in line_imgs
    ]


def tesseract_ocr_parallel(imgs, bboxes, langs: List[str], cpus=None) -> List[List[str]]:
    _require_pytesseract()
    workers = min(len(imgs), cpus or os.cpu_count() or 1)
    workers = max(workers // 2, 1)  # tesseract runs multi-threaded per call
    with ProcessPoolExecutor(max_workers=workers) as executor:
        return list(
            tqdm(
                executor.map(tesseract_ocr, imgs, bboxes, langs),
                total=len(imgs), desc="Running tesseract OCR",
            )
        )


def tesseract_bboxes(img) -> List[tuple]:
    """Word-level detection boxes from tesseract's layout pass."""
    pytesseract = _require_pytesseract()
    from pytesseract import Output

    ocr = pytesseract.image_to_data(np.asarray(img, np.uint8), output_type=Output.DICT)
    return [
        (x, y, x + w, y + h)
        for x, y, w, h in zip(ocr["left"], ocr["top"], ocr["width"], ocr["height"])
    ]


def tesseract_parallel(imgs) -> List[List[tuple]]:
    _require_pytesseract()
    workers = max(min(len(imgs), os.cpu_count() or 1) // 4, 1)
    with ProcessPoolExecutor(max_workers=workers) as executor:
        return list(
            tqdm(
                executor.map(tesseract_bboxes, imgs),
                total=len(imgs), desc="Running tesseract bbox detection",
            )
        )


# tesseract traineddata code -> language name (factual mapping; must match
# the reference table for comparable language coverage)
TESS_CODE_TO_LANGUAGE = {
    "afr": "Afrikaans", "amh": "Amharic", "ara": "Arabic", "asm": "Assamese",
    "aze": "Azerbaijani", "bel": "Belarusian", "ben": "Bengali", "bod": "Tibetan",
    "bos": "Bosnian", "bre": "Breton", "bul": "Bulgarian", "cat": "Catalan",
    "ceb": "Cebuano", "ces": "Czech", "chi_sim": "Chinese", "chr": "Cherokee",
    "cym": "Welsh", "dan": "Danish", "deu": "German", "dzo": "Dzongkha",
    "ell": "Greek", "eng": "English", "epo": "Esperanto", "est": "Estonian",
    "eus": "Basque", "fas": "Persian", "fin": "Finnish", "fra": "French",
    "fry": "Western Frisian", "guj": "Gujarati", "gla": "Scottish Gaelic",
    "gle": "Irish", "glg": "Galician", "heb": "Hebrew", "hin": "Hindi",
    "hrv": "Croatian", "hun": "Hungarian", "hye": "Armenian", "iku": "Inuktitut",
    "ind": "Indonesian", "isl": "Icelandic", "ita": "Italian", "jav": "Javanese",
    "jpn": "Japanese", "kan": "Kannada", "kat": "Georgian", "kaz": "Kazakh",
    "khm": "Khmer", "kir": "Kyrgyz", "kor": "Korean", "lao": "Lao",
    "lat": "Latin", "lav": "Latvian", "lit": "Lithuanian", "mal": "Malayalam",
    "mar": "Marathi", "mkd": "Macedonian", "mlt": "Maltese", "mon": "Mongolian",
    "msa": "Malay", "mya": "Burmese", "nep": "Nepali", "nld": "Dutch",
    "nor": "Norwegian", "ori": "Oriya", "pan": "Punjabi", "pol": "Polish",
    "por": "Portuguese", "pus": "Pashto", "ron": "Romanian", "rus": "Russian",
    "san": "Sanskrit", "sin": "Sinhala", "slk": "Slovak", "slv": "Slovenian",
    "snd": "Sindhi", "spa": "Spanish", "sqi": "Albanian", "srp": "Serbian",
    "swa": "Swahili", "swe": "Swedish", "syr": "Syriac", "tam": "Tamil",
    "tel": "Telugu", "tgk": "Tajik", "tha": "Thai", "tir": "Tigrinya",
    "tur": "Turkish", "uig": "Uyghur", "ukr": "Ukrainian", "urd": "Urdu",
    "uzb": "Uzbek", "vie": "Vietnamese", "yid": "Yiddish",
}

TESS_LANGUAGE_TO_CODE = {v: k for k, v in TESS_CODE_TO_LANGUAGE.items()}
