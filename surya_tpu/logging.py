"""Package logger (one namespace logger, configured once on import).

Counterpart of surya/logging.py:6-24; level comes from settings.LOGLEVEL and
FutureWarnings are silenced the same way, since predictors import torch-adjacent
libraries that warn freely.
"""

import logging
import warnings

from surya_tpu.settings import settings

_LOGGER_NAME = "surya_tpu"
_LINE_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def get_logger() -> logging.Logger:
    return logging.getLogger(_LOGGER_NAME)


def configure_logging() -> None:
    """Idempotent: attaches one stream handler and applies the configured
    level; safe to call again after changing settings.LOGLEVEL."""
    logger = get_logger()
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_LINE_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(settings.LOGLEVEL)
    warnings.simplefilter(action="ignore", category=FutureWarning)


configure_logging()
