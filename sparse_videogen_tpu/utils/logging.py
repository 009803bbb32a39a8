"""Logger (reference: svg/logger.py wraps loguru; stdlib logging here)."""

import logging
import os
import sys

logger = logging.getLogger("sparse_videogen_tpu")
if not logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | svt | %(message)s"))
    logger.addHandler(h)
    logger.setLevel(os.environ.get("SVT_LOG_LEVEL", "INFO"))
