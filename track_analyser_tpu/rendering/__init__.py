"""Rendering tier: HTML, MIDI, report artefacts."""

from . import midi, outputs

__all__ = ["midi", "outputs"]
