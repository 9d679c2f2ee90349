"""CLI file I/O conventions (reference programs/file.c).

* Input sample files are BIG-ENDIAN uint16 on disk (file_load_be16,
  file.c:337-358); sizes must be even.
* ``-`` / no file means stdin; output may be stdout (binary).
* Saving refuses to overwrite existing files or directories
  (file.c:386-399) except when writing to stdout.
"""

from __future__ import annotations

import os
import sys

import numpy as np

STD_IN_MARK = "/*stdin*\\"
STD_OUT_MARK = "/*stdout*\\"


class FileError(OSError):
    pass


def load_bytes(filename: str) -> bytes:
    if filename == STD_IN_MARK:
        return sys.stdin.buffer.read()
    try:
        with open(filename, "rb") as f:
            return f.read()
    except OSError as e:
        raise FileError(f"Can't open '{filename}': {e.strerror}") from e


def load_be16(filename: str) -> np.ndarray:
    """Load a sample file: big-endian u16 on disk -> host-order uint16."""
    raw = load_bytes(filename)
    if len(raw) == 0:
        raise FileError(f"'{filename}' is empty")
    if len(raw) % 2:
        raise FileError(f"{filename}: file size not a multiple of 2")
    return np.frombuffer(raw, dtype=">u2").astype(np.uint16)


def save_bytes(filename: str, data: bytes) -> None:
    if filename == STD_OUT_MARK:
        sys.stdout.buffer.write(data)
        sys.stdout.buffer.flush()
        return
    if os.path.isdir(filename):
        raise FileError(f"'{filename}' is a directory")
    if os.path.exists(filename):
        raise FileError(f"'{filename}' already exists")
    with open(filename, "wb") as f:
        f.write(data)


def save_be16(filename: str, samples_u16: np.ndarray) -> None:
    save_bytes(filename, np.ascontiguousarray(samples_u16, dtype=np.uint16)
               .astype(">u2").tobytes())
