"""Build the native libraries: ``python -m track_analyser_tpu.native.build``.

Compiles native/src/{decoder,transport,flac}.cpp into libta_native.so and
— when the FFmpeg development headers/libraries are present —
native/src/ffmpeg.cpp into the SEPARATE libta_ffmpeg.so (the catch-all
decode tier; kept separate so libta_native never depends on the FFmpeg
runtime). Every build failure leaves the pure-numpy codecs authoritative.
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
FFMPEG_SRC = HERE / "src" / "ffmpeg.cpp"
FFMPEG_OUT = HERE / "libta_ffmpeg.so"


def _compile(cxx: str, srcs, out: Path, extra=(), verbose: bool = True) -> bool:
    cmd = [
        cxx,
        "-O3",
        "-march=native",
        # no FMA contraction: the ms6 transport's error-feedback encoder
        # must track the decoder's float32 multiply-then-add law
        # bit-for-bit against the numpy fallback (see transport.cpp
        # ta_quantise_mid6); contracted a+b*c rounds differently
        "-ffp-contract=off",
        # let gcc vectorise nearbyintf (-> vroundps, same round-to-
        # nearest-even results) in the transport raw-candidate loops;
        # neither flag relaxes FP arithmetic itself, so bit-parity with
        # the numpy fallback is preserved
        "-fno-math-errno",
        "-fno-trapping-math",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *[str(s) for s in srcs],
        "-o",
        str(out),
        *extra,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError as exc:
        if verbose:
            print(f"[native] build of {out.name} failed: {exc}", file=sys.stderr)
        return False
    if verbose:
        print(f"[native] built {out}")
    return True


def build(verbose: bool = True) -> bool:
    cxx = shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        if verbose:
            print("[native] no C++ compiler found — skipping", file=sys.stderr)
        return False
    ok = _compile(cxx, SRCS, OUT, verbose=verbose)
    # Optional FFmpeg tier — best-effort; absence is fine.
    _compile(
        cxx,
        [FFMPEG_SRC],
        FFMPEG_OUT,
        extra=["-lavformat", "-lavcodec", "-lavutil", "-lswresample"],
        verbose=verbose,
    )
    return ok


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
