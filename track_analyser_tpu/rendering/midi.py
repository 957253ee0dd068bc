"""Dependency-free standard MIDI file writer.

The reference writes MIDI via mido with a raw-bytes fallback
(rendering/outputs.py:80-177). This framework has no mido, so the byte
assembler is the primary path: a type-1 SMF with one track, a 120 BPM
set_tempo meta event, delta-encoded note on/off pairs at 480 ticks/beat.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import pandas as pd

__all__ = ["write_midi", "encode_var_len"]

TICKS_PER_BEAT = 480
_TEMPO_USEC = 500_000  # 120 BPM


def encode_var_len(value: int) -> bytes:
    """Encode ``value`` as a MIDI variable-length quantity."""

    if value < 0:
        raise ValueError("delta times must be non-negative")
    chunks = [value & 0x7F]
    value >>= 7
    while value:
        chunks.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(chunks))


def _note_events(notes: pd.DataFrame) -> List[Tuple[float, bool, int, int]]:
    """Time-sorted (time_beats, is_note_on, pitch, velocity) events."""

    events: List[Tuple[float, bool, int, int]] = []
    for _, row in notes.iterrows():
        start = float(row["start"])
        end = start + float(row["duration"])
        pitch = int(row["pitch"])
        velocity = int(row["velocity"])
        events.append((start, True, pitch, velocity))
        events.append((end, False, pitch, 0))
    events.sort(key=lambda item: item[0])
    return events


def write_midi(notes: pd.DataFrame, path: "str | Path") -> None:
    """Write the note table (columns start/duration/pitch/velocity) to SMF."""

    track = bytearray()
    # set_tempo meta event at t=0
    track += b"\x00\xff\x51\x03" + _TEMPO_USEC.to_bytes(3, "big")

    last_tick = 0
    for time_beats, note_on, pitch, velocity in _note_events(notes):
        tick = int(round(time_beats * TICKS_PER_BEAT))
        delta = max(0, tick - last_tick)
        last_tick = tick
        status = 0x90 if note_on else 0x80
        track += encode_var_len(delta)
        track += bytes([status, pitch & 0x7F, velocity & 0x7F])

    track += b"\x00\xff\x2f\x00"  # end of track

    header = (
        b"MThd"
        + (6).to_bytes(4, "big")
        + (1).to_bytes(2, "big")  # format 1
        + (1).to_bytes(2, "big")  # one track
        + TICKS_PER_BEAT.to_bytes(2, "big")
    )
    track_chunk = b"MTrk" + len(track).to_bytes(4, "big") + bytes(track)
    Path(path).write_bytes(header + track_chunk)
