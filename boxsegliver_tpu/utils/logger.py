"""Logger: console + timestamped file under model_dir/logs
(reference utils/logger.py:27-89, installed at entry/main.py:101-114)."""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Optional

FMT = "%(asctime)s %(levelname).1s %(message)s"
DATEFMT = "%H:%M:%S"


def setup_logger(model_dir: Optional[str] = None, mode: str = "train",
                 tag: str = "", out_file: Optional[str] = None,
                 level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("boxsegliver")
    logger.setLevel(level)
    logger.handlers.clear()
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(logging.Formatter(FMT, DATEFMT))
    logger.addHandler(sh)
    if model_dir:
        log_dir = Path(model_dir) / "logs"
        log_dir.mkdir(parents=True, exist_ok=True)
        name = out_file or "{}_{}_{}".format(
            time.strftime("%Y%m%d_%H%M%S"), mode, tag or "run")
        fh = logging.FileHandler(log_dir / name)
        fh.setFormatter(logging.Formatter(FMT, DATEFMT))
        logger.addHandler(fh)
    logger.propagate = False
    return logger
