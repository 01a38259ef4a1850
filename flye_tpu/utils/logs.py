"""Logging setup: timestamped console + optional file sink.

Mirrors the reference's dual console/file logging discipline
(reference: flye/main.py:579-599, src/common/logger.h) with one root
package logger.
"""

from __future__ import annotations

import logging
import sys
import time
from contextlib import contextmanager
from typing import Optional


def configure_logging(log_file: Optional[str] = None, debug: bool = False) -> None:
    logger = logging.getLogger("flye_tpu")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()

    console = logging.StreamHandler(sys.stderr)
    console.setLevel(logging.DEBUG if debug else logging.INFO)
    console.setFormatter(
        logging.Formatter("[%(asctime)s] %(levelname)s: %(message)s",
                          "%Y-%m-%d %H:%M:%S"))
    logger.addHandler(console)

    if log_file:
        fh = logging.FileHandler(log_file, mode="a")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter("[%(asctime)s] %(levelname)s: %(message)s",
                              "%Y-%m-%d %H:%M:%S"))
        logger.addHandler(fh)


def human_bytes(n: float) -> str:
    for unit in ("b", "Kb", "Mb", "Gb", "Tb"):
        if abs(n) < 1024:
            return f"{n:.1f} {unit}" if unit != "b" else f"{int(n)} {unit}"
        n /= 1024
    return f"{n:.1f} Pb"


@contextmanager
def stage_timer(name: str, logger: Optional[logging.Logger] = None):
    """Per-stage wall-clock timing (the reference keeps per-phase timers in
    its hot loops, reference: src/sequence/overlap.cpp:128-158)."""
    log = logger or logging.getLogger("flye_tpu")
    start = time.monotonic()
    log.info("%s: started", name)
    try:
        yield
    finally:
        log.info("%s: done in %.1f s", name, time.monotonic() - start)
