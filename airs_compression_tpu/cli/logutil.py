"""CLI logging: leveled, colored stderr output (reference programs/log.{c,h}).

Levels QUIET(0) < ERROR < WARNING < INFO < DEBUG < MAX mirror the reference;
-v/-q move the level up/down; NO_COLOR / CLICOLOR_FORCE / CLICOLOR env vars
and isatty detection control ANSI color exactly like log_setup_color
(log.c:24-54).
"""

from __future__ import annotations

import os
import sys

QUIET, ERROR, WARNING, INFO, DEBUG, MAX = range(6)
DEFAULT = INFO

_COLORS = {ERROR: "\x1b[1;31m", WARNING: "\x1b[1;33m"}
_RESET = "\x1b[0m"


class Logger:
    def __init__(self) -> None:
        self.level = DEFAULT
        self.color: bool | None = None  # None = auto

    def setup_color(self) -> None:
        if os.environ.get("NO_COLOR"):
            self.color = False
        elif os.environ.get("CLICOLOR_FORCE", "0") != "0":
            self.color = True
        elif os.environ.get("CLICOLOR") == "0":
            self.color = False

    def _use_color(self) -> bool:
        if self.color is not None:
            return self.color
        return sys.stderr.isatty()

    def increase(self) -> None:
        self.level = min(self.level + 1, MAX)

    def decrease(self) -> None:
        self.level = max(self.level - 1, QUIET)

    def msg(self, level: int, prefix: str | None, text: str) -> None:
        if self.level < level:
            return
        if prefix:
            if self._use_color() and level in _COLORS:
                prefix = f"{_COLORS[level]}{prefix}{_RESET}"
            sys.stderr.write(f"{prefix}: {text}\n")
        else:
            sys.stderr.write(text)
        sys.stderr.flush()

    def error(self, text: str) -> None:
        self.msg(ERROR, "error", text)

    def warning(self, text: str) -> None:
        self.msg(WARNING, "warning", text)

    def info_plain(self, text: str) -> None:
        self.msg(INFO, None, text)

    def debug(self, text: str) -> None:
        self.msg(DEBUG, "debug", text)

    def debug_plain(self, text: str) -> None:
        self.msg(DEBUG, None, text)


LOG = Logger()


def make_human_readable(size: int, verbose: bool):
    """(value, precision, suffix) — mirrors util_make_human_readable
    (reference programs/util.c:55-113, zstd-style)."""
    if verbose:
        if size >= (1 << 53):
            return size / (1 << 20), 2, " MiB"
        return float(size), 0, " B"
    for shift, suffix in ((60, " EiB"), (50, " PiB"), (40, " TiB"),
                          (30, " GiB"), (20, " MiB"), (10, " KiB")):
        if size >= (1 << shift):
            value = size / (1 << shift)
            break
    else:
        value, suffix = float(size), " B"
    if value >= 100 or int(value) == size:
        prec = 0
    elif value >= 10:
        prec = 1
    elif value > 1:
        prec = 2
    else:
        prec = 3
    return value, prec, suffix
