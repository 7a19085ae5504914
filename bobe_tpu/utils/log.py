"""Process-aware logging for bobe_tpu.

Mirrors the behaviour of the reference logger (/root/reference/BOBE/utils/log.py):
only the primary process writes to the console, stdout carries <=INFO and stderr
carries >=WARNING, and every process can optionally write a rotating per-process
log file. Process identity comes from ``jax.distributed`` (or the
``JAX_PROCESS_INDEX`` env var) instead of mpi4py.
"""
from __future__ import annotations

import logging
import logging.handlers
import os
import sys

_LEVELS = {
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
    "QUIET": logging.CRITICAL,
}

_configured = False
_process_index = None


def process_index() -> int:
    """Index of this process in the distributed job (0 if single-process).

    Deliberately NEVER calls jax.process_index(): that initializes the
    backend, and the logger is imported in processes that must not touch an
    accelerator (MultiprocessPool likelihood workers — a second client on a
    single-process TPU runtime deadlocks) and in the orchestrator long before
    it wants to pay backend bring-up. The rank comes from the
    jax.distributed global state (populated by jax.distributed.initialize
    without any backend involvement) or the JAX_PROCESS_INDEX env var.
    """
    global _process_index
    if _process_index is None:
        env = os.environ.get("JAX_PROCESS_INDEX")
        if env is not None:
            _process_index = int(env)
        else:
            try:
                from jax._src import distributed

                _process_index = int(distributed.global_state.process_id or 0)
            except Exception:
                _process_index = 0
    return _process_index


def is_main_process() -> bool:
    return process_index() == 0


class _MaxLevelFilter(logging.Filter):
    def __init__(self, max_level):
        super().__init__()
        self.max_level = max_level

    def filter(self, record):
        return record.levelno <= self.max_level


def setup_logging(verbosity: str = "INFO", log_dir: str | None = None) -> None:
    """Configure root 'bobe_tpu' logger. Safe to call repeatedly."""
    global _configured
    root = logging.getLogger("bobe_tpu")
    level = _LEVELS.get(verbosity.upper(), logging.INFO)
    root.setLevel(level)
    if not _configured:
        root.propagate = False
        if is_main_process():
            out = logging.StreamHandler(sys.stdout)
            out.setLevel(logging.DEBUG)
            out.addFilter(_MaxLevelFilter(logging.INFO))
            err = logging.StreamHandler(sys.stderr)
            err.setLevel(logging.WARNING)
            fmt = logging.Formatter("[%(name)s] %(levelname)s: %(message)s")
            out.setFormatter(fmt)
            err.setFormatter(fmt)
            root.addHandler(out)
            root.addHandler(err)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.handlers.RotatingFileHandler(
                os.path.join(log_dir, f"bobe_tpu.rank{process_index()}.log"),
                maxBytes=5 * 1024 * 1024,
                backupCount=2,
            )
            fh.setFormatter(
                logging.Formatter("%(asctime)s [%(name)s] %(levelname)s: %(message)s")
            )
            root.addHandler(fh)
        _configured = True


def update_verbosity(verbosity: str = "INFO") -> None:
    setup_logging(verbosity)
    logging.getLogger("bobe_tpu").setLevel(_LEVELS.get(verbosity.upper(), logging.INFO))


def get_logger(name: str) -> logging.Logger:
    setup_logging()
    return logging.getLogger(f"bobe_tpu.{name}")
