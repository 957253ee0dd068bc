"""Build the native decoder library: ``python -m track_analyser_tpu.native.build``.

Compiles native/src/decoder.cpp into libta_native.so next to binding.py.
The library is an optional fast path — every build failure leaves the
pure-numpy codecs authoritative.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SRCS = [
    HERE / "src" / "decoder.cpp",
    HERE / "src" / "transport.cpp",
    HERE / "src" / "flac.cpp",
]
OUT = HERE / "libta_native.so"


def build(verbose: bool = True) -> bool:
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        if verbose:
            print("[native] no C++ compiler found — skipping", file=sys.stderr)
        return False
    cmd = [
        cxx,
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *[str(s) for s in SRCS],
        "-o",
        str(OUT),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError as exc:
        if verbose:
            print(f"[native] build failed: {exc}", file=sys.stderr)
        return False
    if verbose:
        print(f"[native] built {OUT}")
    return True


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
