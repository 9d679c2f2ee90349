"""Build the reference C library (/root/reference) as a shared test oracle.

The reference is compiled unmodified with gcc into ``tests/.refbuild/
libairspace_ref.so`` and accessed via ctypes (see wrapper.py).  This gives
randomized differential tests a ground-truth encoder without copying any
reference code into this repository.  The vendored xxhash single header the
reference expects is resolved from pyarrow's vendored copy on this system.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]
REF = pathlib.Path("/root/reference")
BUILD_DIR = REPO / "tests" / ".refbuild"
LIB = BUILD_DIR / "libairspace_ref.so"


def _find_xxhash_include() -> pathlib.Path:
    candidates = []
    for base in map(pathlib.Path, sys.path):
        p = base / "pyarrow" / "include" / "arrow" / "vendored" / "xxhash"
        if (p / "xxhash.h").exists():
            candidates.append(p)
    if candidates:
        return candidates[0]
    # fallback: search site-packages
    import glob

    hits = glob.glob("/opt/venv/lib/python*/site-packages/pyarrow/include/arrow/vendored/xxhash")
    if hits:
        return pathlib.Path(hits[0])
    raise FileNotFoundError("no vendored xxhash.h found for the oracle build")


def build(force: bool = False) -> pathlib.Path:
    if LIB.exists() and not force:
        return LIB
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    xxh_inc = _find_xxhash_include()
    srcs = [
        REF / "lib" / "compress" / "cmp.c",
        REF / "lib" / "compress" / "encoder.c",
        REF / "lib" / "compress" / "preprocess.c",
        REF / "lib" / "common" / "header.c",
        REF / "lib" / "common" / "cmp_errors.c",
    ]
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-std=c89",
        "-I", str(REF / "lib"),
        "-I", str(xxh_inc),
        "-o", str(LIB),
        *map(str, srcs),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
