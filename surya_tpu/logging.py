"""Single-logger setup (reference: surya/logging.py:6-24)."""

import logging
import warnings

from surya_tpu.settings import settings


def configure_logging():
    logger = get_logger()
    if not logger.handlers:
        handler = logging.StreamHandler()
        formatter = logging.Formatter("%(asctime)s [%(levelname)s] %(name)s: %(message)s")
        handler.setFormatter(formatter)
        logger.addHandler(handler)
    logger.setLevel(settings.LOGLEVEL)
    warnings.simplefilter(action="ignore", category=FutureWarning)


def get_logger() -> logging.Logger:
    return logging.getLogger("surya_tpu")


configure_logging()
