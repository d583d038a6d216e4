"""Debug levels, assertions, and crash diagnostics.

Reference parity (`/root/reference/inc/_debug.hxx`): build modes
``BUILD_RELEASE..BUILD_TRACE`` (:25-38), leveled ``LOG/PRINT`` macros (:91-208),
``ASSERT``/``ASSERT_THAT`` (:215-227), and the SIGSEGV backtrace handler
(:235-262, installed at `main.cxx:234`).

The reference compiles these in/out with ``-DBUILD=N``; here the level is a runtime
setting (`set_build_mode`), and device-side value checks use `chex`-style
assertions that are no-ops under jit unless debug mode is on.
"""
from __future__ import annotations

import faulthandler
import io
import os
import sys

from .logging import log

__all__ = [
    "BUILD_RELEASE", "BUILD_ERROR", "BUILD_WARNING", "BUILD_INFO",
    "BUILD_DEBUG", "BUILD_TRACE",
    "set_build_mode", "build_mode",
    "ASSERT", "ASSERT_THAT",
    "log_error", "log_warning", "log_info", "log_debug", "log_trace",
    "install_fault_handler",
]

# Build modes (`_debug.hxx:25-38`).
BUILD_RELEASE = 0
BUILD_ERROR = 1
BUILD_WARNING = 2
BUILD_INFO = 3
BUILD_DEBUG = 4
BUILD_TRACE = 5

_MODE = int(os.environ.get("LINKPRED_BUILD", BUILD_RELEASE))


def set_build_mode(mode: int) -> None:
    global _MODE
    _MODE = int(mode)


def build_mode() -> int:
    return _MODE


def ASSERT(exp, msg: str = "") -> None:
    """Active at BUILD_ERROR+ (`_debug.hxx:215-227`); no-op in release mode."""
    if _MODE >= BUILD_ERROR and not exp:
        raise AssertionError(msg or "ASSERT failed")


def ASSERT_THAT(exp_fn, msg: str = "") -> None:
    """Lazy-predicate assert (`_debug.hxx:221-227`)."""
    if _MODE >= BUILD_ERROR and not exp_fn():
        raise AssertionError(msg or "ASSERT_THAT failed")


def _leveled(level: int, tag: str):
    def emit(msg: str) -> None:
        if _MODE >= level:
            log(f"{tag}{msg}")
    return emit


log_error = _leveled(BUILD_ERROR, "E ")
log_warning = _leveled(BUILD_WARNING, "W ")
log_info = _leveled(BUILD_INFO, "I ")
log_debug = _leveled(BUILD_DEBUG, "D ")
log_trace = _leveled(BUILD_TRACE, "T ")


def install_fault_handler(file=None) -> None:
    """Crash backtraces on SIGSEGV/SIGABRT — the reference's ``install_sigsegv``
    (`_debug.hxx:235-262`), via the stdlib faulthandler.  No-op when stderr has
    no OS-level fd (e.g. under pytest capture)."""
    try:
        faulthandler.enable(file=file or sys.stderr, all_threads=True)
    except (io.UnsupportedOperation, AttributeError, ValueError):
        pass
