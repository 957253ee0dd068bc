"""Model tier: JAX replacements for the reference's optional neural paths
(madmom downbeats, demucs stems)."""

from . import downbeat, separation

__all__ = ["downbeat", "separation"]
