"""ANSI console logger.

Capability twin of the reference ``misc/logger.py``: timestamped,
color-coded ``info/warn/error/success`` print helpers; ``error`` exits
the process (``misc/logger.py:22-29``) unless ``exit_on_error`` is
disabled (useful under tests).
"""

from __future__ import annotations

import datetime
import sys

_RESET = "\033[0m"
_COLORS = {
    "info": "\033[94m",      # blue
    "warn": "\033[93m",      # yellow
    "error": "\033[91m",     # red
    "success": "\033[92m",   # green
}

exit_on_error = True


def _emit(level: str, *messages, stream=None) -> None:
    stream = stream or (sys.stderr if level == "error" else sys.stdout)
    stamp = datetime.datetime.now().strftime("%m-%d %H:%M:%S")
    color = _COLORS[level]
    text = " ".join(str(m) for m in messages)
    stream.write(f"{color}[{level.upper():7s} {stamp}]{_RESET} {text}\n")
    stream.flush()


def info(*messages) -> None:
    _emit("info", *messages)


def warn(*messages) -> None:
    _emit("warn", *messages)


def success(*messages) -> None:
    _emit("success", *messages)


def error(*messages) -> None:
    _emit("error", *messages)
    if exit_on_error:
        sys.exit(1)
