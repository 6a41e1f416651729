"""Environment collection + logging helpers (get_root_logger / collect_env
equivalents, /root/reference/mmpt/utils/logger.py:7, collect_env.py:7)."""

from __future__ import annotations

import logging
import os
import platform
import sys
from typing import Dict, Optional


# PJRT plugins may register TPU hardware under a platform name other than
# "tpu" (e.g. a tunneled chip registers as "axon" while its devices still
# report .platform == "tpu").  Forcing jax_platforms="tpu" then fails with
# "No jellyfish device found" even though a TPU is reachable.
_TPU_PLATFORM_ALIASES = ("tpu", "axon")


def force_platform(name: str) -> None:
    """Force the jax platform by name, resolving TPU plugin aliases.

    Must be called before any other jax use (backends are cached once
    initialized).  ``name == "tpu"`` tries each known TPU-providing
    plugin name in turn and keeps the first whose devices identify as
    TPU; other names are forced literally.
    """
    import jax

    if name != "tpu":
        jax.config.update("jax_platforms", name)
        return
    errors = []
    for candidate in _TPU_PLATFORM_ALIASES:
        jax.config.update("jax_platforms", candidate)
        try:
            devices = jax.devices()
        except RuntimeError as e:  # backend init failed; try the next alias
            errors.append(f"{candidate}: {e}")
            continue
        if devices and devices[0].platform == "tpu":
            return
        errors.append(f"{candidate}: devices are {devices}")
    raise RuntimeError(
        "no TPU platform available (tried "
        + ", ".join(_TPU_PLATFORM_ALIASES)
        + "):\n"
        + "\n".join(errors)
    )


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
