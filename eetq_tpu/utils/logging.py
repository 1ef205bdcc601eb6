"""Leveled, env-configured logging.

Replaces the reference's FasterTransformer singleton logger
(`csrc/utils/logger.{h,cc}`): level from EETQ_LOG_LEVEL
(DEBUG/INFO/WARNING/ERROR, like FT_LOG_LEVEL), and
EETQ_LOG_FIRST_RANK_ONLY=ON silences every process except jax process 0
(the FT_LOG_FIRST_RANK_ONLY behavior, logger.cc:24-56).
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def _configure() -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    level_name = os.environ.get("EETQ_LOG_LEVEL", "INFO").upper()
    level = getattr(logging, level_name, logging.INFO)
    if os.environ.get("EETQ_LOG_FIRST_RANK_ONLY", "").upper() in ("ON", "1", "TRUE"):
        try:
            import jax

            if jax.process_index() != 0:
                level = logging.ERROR
        except Exception:
            pass
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("[EETQ][%(levelname)s][%(name)s] %(message)s")
    )
    root = logging.getLogger("eetq_tpu")
    root.setLevel(level)
    root.addHandler(handler)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    if not name.startswith("eetq_tpu"):
        name = f"eetq_tpu.{name}"
    return logging.getLogger(name)
