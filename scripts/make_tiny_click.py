"""Write the tiny click-track smoke fixture for the analyser CLI.

One 4/4 bar at 120 BPM: beat 1 is an accented 1.5 kHz click, beats 2-4
are 1 kHz clicks — the same fixture semantics as the reference smoke test
(scripts/make_tiny_click.py there). Synthesis here is vectorised: every
click is one row of a tone matrix scatter-added into the output in a
single call.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from track_analyser_tpu.io import write_wav

DEFAULT_OUTPUT = Path("examples/tiny_click_120.wav")


def synth_click_bar(
    sr: int = 44_100,
    bpm: float = 120.0,
    beats_per_bar: int = 4,
    click_seconds: float = 0.03,
    accent_hz: float = 1500.0,
    beat_hz: float = 1000.0,
) -> np.ndarray:
    """One bar of exponentially-decaying sine clicks, accent on beat 1."""

    period = 60.0 / bpm
    click_n = int(click_seconds * sr)
    t = np.arange(click_n) / sr
    decay = np.exp(-50.0 * t)

    freqs = np.full(beats_per_bar, beat_hz)
    amps = np.full(beats_per_bar, 0.6)
    freqs[0], amps[0] = accent_hz, 0.9
    tones = amps[:, None] * np.sin(2.0 * np.pi * freqs[:, None] * t[None, :]) * decay

    starts = np.round(np.arange(beats_per_bar) * period * sr).astype(int)
    out = np.zeros(int(np.ceil(beats_per_bar * period * sr)) + click_n, dtype=np.float64)
    positions = (starts[:, None] + np.arange(click_n)[None, :]).reshape(-1)
    np.add.at(out, positions, tones.reshape(-1))
    return np.clip(out, -1.0, 1.0).astype(np.float32)


def main(argv: "list[str] | None" = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "output",
        nargs="?",
        default=str(DEFAULT_OUTPUT),
        help="destination WAV path (default: %(default)s)",
    )
    args = parser.parse_args(argv)

    path = Path(args.output).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(path, synth_click_bar(), 44_100, subtype="PCM_16")
    print(f"Wrote click track to {path}")


if __name__ == "__main__":
    main()
