"""Host I/O tier: codecs and the audio loader."""

from .codecs import decode_file, decode_wav, write_wav, AudioDecodeError
from .loader import load_audio

__all__ = ["decode_file", "decode_wav", "write_wav", "AudioDecodeError", "load_audio"]
