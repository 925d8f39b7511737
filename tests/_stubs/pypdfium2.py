"""Minimal pypdfium2 stub: the reference imports it unconditionally at module
scope (surya/input/processing.py:5); tests never rasterize PDFs."""


class PdfDocument:
    def __init__(self, *args, **kwargs):
        raise ImportError("pypdfium2 stub: PDF rendering unavailable in tests")
