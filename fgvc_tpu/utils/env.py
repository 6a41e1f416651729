"""Environment collection + logging helpers (get_root_logger / collect_env
equivalents, /root/reference/mmpt/utils/logger.py:7, collect_env.py:7)."""

from __future__ import annotations

import logging
import os
import platform
import sys
from typing import Dict, Optional


def collect_env() -> Dict[str, str]:
    import jax

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "devices": ", ".join(str(d) for d in jax.devices()),
        "default_backend": jax.default_backend(),
        "process": f"{jax.process_index()}/{jax.process_count()}",
    }
    try:
        import flax
        import optax

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info


def get_root_logger(
    log_file: Optional[str] = None, level: int = logging.INFO
) -> logging.Logger:
    logger = logging.getLogger("fgvc_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
