"""An independent music-rendering engine for out-of-family validation.

Every model in this repo is trained and mostly evaluated on waveforms from
``tests/synth.py`` / ``track_analyser_tpu/models`` generators — one DSP
vocabulary (closed-form ``np.sin`` partials, exponential decay envelopes,
enveloped noise bursts, sine-sweep kicks). This module is a SECOND engine
that shares none of that code or design, so results measured on its output
are evidence about generalisation, not memorisation (VERDICT r3 missing #2):

* oscillators are phase-accumulator WAVETABLE lookups (shared 2048-sample
  tables with linear interpolation), not per-sample closed forms;
* envelopes are LINEAR-segment ADSR ramps, not exponentials;
* percussion is an impulse/noise burst shaped by RESONANT BIQUAD filters
  (RBJ cookbook), not enveloped sine sweeps;
* the "vocal" part is a glottal-style pulse train through cascaded formant
  biquads;
* the mix passes through a Schroeder comb/allpass reverb — a component no
  training generator has at all.

It intentionally imports NOTHING from ``tests/`` or
``track_analyser_tpu.models`` (tests assert this), only numpy.
"""

from __future__ import annotations

import numpy as np

TABLE_LEN = 2048


def _wavetable(kind: str) -> np.ndarray:
    """Band-limited-ish single-cycle tables built by additive summation
    over the first 24 harmonics (Fourier-series weights per shape)."""

    k = np.arange(1, 25, dtype=np.float64)
    phase = np.linspace(0.0, 1.0, TABLE_LEN, endpoint=False)
    if kind == "saw":
        weights = 1.0 / k
        signs = np.where(k % 2 == 0, -1.0, 1.0)
    elif kind == "square":
        weights = np.where(k % 2 == 1, 1.0 / k, 0.0)
        signs = np.ones_like(k)
    elif kind == "triangle":
        weights = np.where(k % 2 == 1, 1.0 / k**2, 0.0)
        signs = np.where(((k - 1) // 2) % 2 == 0, 1.0, -1.0)
    else:  # organ-ish: fundamental + octaves
        weights = np.where(np.isin(k, (1, 2, 4, 8)), 1.0 / np.sqrt(k), 0.0)
        signs = np.ones_like(k)
    table = np.zeros(TABLE_LEN)
    for ki, w, s in zip(k, weights, signs):
        table += s * w * np.sin(2.0 * np.pi * ki * phase)
    return table / np.max(np.abs(table))


_TABLES = {kind: _wavetable(kind) for kind in ("saw", "square", "triangle", "organ")}


def osc(kind: str, freq_hz: "float | np.ndarray", n: int, sr: int, phase0: float = 0.0) -> np.ndarray:
    """Phase-accumulator wavetable oscillator with linear interpolation.
    ``freq_hz`` may be a scalar or a per-sample array (glide/vibrato)."""

    freq = np.broadcast_to(np.asarray(freq_hz, dtype=np.float64), (n,))
    phase = (phase0 + np.cumsum(freq) / sr) % 1.0
    x = phase * TABLE_LEN
    i0 = x.astype(np.int64) % TABLE_LEN
    frac = x - np.floor(x)
    table = _TABLES[kind]
    return table[i0] * (1.0 - frac) + table[(i0 + 1) % TABLE_LEN] * frac


def adsr(n: int, sr: int, a: float, d: float, s_level: float, r: float) -> np.ndarray:
    """Linear-segment ADSR over ``n`` samples (release eats the tail)."""

    na, nd, nr = (max(1, int(t * sr)) for t in (a, d, r))
    ns = max(0, n - na - nd - nr)
    seg = [
        np.linspace(0.0, 1.0, na, endpoint=False),
        np.linspace(1.0, s_level, nd, endpoint=False),
        np.full(ns, s_level),
        np.linspace(s_level, 0.0, nr, endpoint=False),
    ]
    env = np.concatenate(seg)
    return env[:n] if env.size >= n else np.pad(env, (0, n - env.size))


def biquad(x: np.ndarray, b: tuple, a: tuple) -> np.ndarray:
    """Direct-form-I biquad (a0-normalised coefficients)."""

    b0, b1, b2 = b
    a1, a2 = a
    y = np.zeros_like(x)
    x1 = x2 = y1 = y2 = 0.0
    for i in range(x.size):
        y[i] = b0 * x[i] + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        x2, x1 = x1, x[i]
        y2, y1 = y1, y[i]
    return y


def _rbj_bandpass(fc: float, q: float, sr: int) -> tuple:
    w0 = 2.0 * np.pi * fc / sr
    alpha = np.sin(w0) / (2.0 * q)
    a0 = 1.0 + alpha
    return (
        (alpha / a0, 0.0, -alpha / a0),
        ((-2.0 * np.cos(w0)) / a0, (1.0 - alpha) / a0),
    )


def _rbj_lowpass(fc: float, q: float, sr: int) -> tuple:
    w0 = 2.0 * np.pi * fc / sr
    alpha = np.sin(w0) / (2.0 * q)
    cw = np.cos(w0)
    a0 = 1.0 + alpha
    return (
        ((1 - cw) / 2 / a0, (1 - cw) / a0, (1 - cw) / 2 / a0),
        (-2 * cw / a0, (1 - alpha) / a0),
    )


def resonant_drum(kind: str, n: int, sr: int, rng: np.random.Generator) -> np.ndarray:
    """Percussion as an excitation through resonant biquads — no enveloped
    sine sweeps anywhere."""

    if kind == "kick":
        exc = np.zeros(n)
        exc[0] = 1.0
        exc[: int(0.004 * sr)] += rng.normal(0, 0.2, int(0.004 * sr))
        y = biquad(exc, *_rbj_bandpass(55.0, 1.2, sr))
        y += 0.6 * biquad(exc, *_rbj_bandpass(90.0, 0.9, sr))
        y *= adsr(n, sr, 0.001, 0.05, 0.25, 0.18)
    elif kind == "snare":
        exc = rng.normal(0, 1.0, n) * adsr(n, sr, 0.001, 0.03, 0.1, 0.09)
        y = biquad(exc, *_rbj_bandpass(190.0, 1.5, sr))
        y += 0.8 * biquad(exc, *_rbj_bandpass(1800.0, 0.7, sr))
    else:  # hat
        exc = rng.normal(0, 1.0, n) * adsr(n, sr, 0.0005, 0.012, 0.05, 0.03)
        y = biquad(exc, *_rbj_bandpass(7000.0, 1.1, sr))
    peak = np.max(np.abs(y)) or 1.0
    return y / peak


def vocal_phrase(f0_hz: np.ndarray, n: int, sr: int, vowels: list) -> np.ndarray:
    """Glottal-style pulse train through cascaded formant biquads, with a
    5.5 Hz vibrato — structurally unlike the training formant generator
    (which filters noise/saws with closed-form resonances)."""

    t = np.arange(n) / sr
    vib = 1.0 + 0.012 * osc("triangle", 5.5, n, sr)
    freq = np.broadcast_to(np.asarray(f0_hz, dtype=np.float64), (n,)) * vib
    phase = np.cumsum(freq) / sr
    # Rosenberg-ish pulse: narrow raised cosine once per period
    frac = phase % 1.0
    pulse = np.where(frac < 0.35, 0.5 - 0.5 * np.cos(2 * np.pi * frac / 0.35), 0.0)
    pulse = np.diff(pulse, prepend=0.0)  # spectral tilt
    seg_len = n // max(1, len(vowels))
    y = np.zeros(n)
    formant_sets = {
        "a": ((800, 9.0), (1150, 11.0), (2900, 13.0)),
        "i": ((280, 9.0), (2250, 12.0), (2900, 14.0)),
        "o": ((450, 9.0), (800, 10.0), (2830, 13.0)),
        "e": ((400, 9.0), (1600, 12.0), (2700, 13.0)),
    }
    for vi, vowel in enumerate(vowels):
        s, e = vi * seg_len, min(n, (vi + 1) * seg_len)
        seg = pulse[s:e]
        acc = np.zeros(e - s)
        for fc, q in formant_sets[vowel]:
            acc += biquad(seg, *_rbj_bandpass(fc, q, sr))
        y[s:e] = acc * adsr(e - s, sr, 0.04, 0.1, 0.8, 0.12)
    peak = np.max(np.abs(y)) or 1.0
    return y / peak


def schroeder_reverb(x: np.ndarray, sr: int, wet: float = 0.12) -> np.ndarray:
    """Classic 4-comb + 2-allpass Schroeder reverberator."""

    def comb(sig, delay_s, fb):
        d = max(1, int(delay_s * sr))
        out = sig.copy()
        for i in range(d, sig.size):
            out[i] += fb * out[i - d]
        return out

    def allpass(sig, delay_s, g):
        d = max(1, int(delay_s * sr))
        out = np.zeros_like(sig)
        buf = np.zeros(d)
        for i in range(sig.size):
            delayed = buf[i % d]
            out[i] = -g * sig[i] + delayed
            buf[i % d] = sig[i] + g * delayed
        return out

    tail = sum(comb(x, ds, 0.72) for ds in (0.0297, 0.0371, 0.0411, 0.0437)) / 4.0
    tail = allpass(allpass(tail, 0.005, 0.7), 0.0017, 0.7)
    return (1.0 - wet) * x + wet * tail


def render_random_song(
    seed: int,
    sr: int = 22_050,
    bars: int = 16,
    meter: "int | None" = None,
) -> tuple:
    """Render a randomised four-stem song: key, tempo, METER (3 or 4),
    and arrangement are drawn from ``seed`` — parameters no decoder
    weight was ever tuned on (VERDICT r4 #4: the distribution gate).

    Structure kept musical, not adversarial: kick on every beat, snares
    on the meter's backbeats, harmony moving at BAR rate (the real-music
    property the harmonic-change cue exists for), bass walking the
    progression roots. Returns (stems, mix, beat_times, bar_starts,
    meta dict with bpm/meter/transpose/arrangement draws).
    """

    rng = np.random.default_rng(seed)
    bpm = float(rng.uniform(92.0, 132.0))
    if meter is None:
        meter = int(rng.choice([3, 4]))
    transpose = int(rng.integers(-5, 7))
    tf = 2.0 ** (transpose / 12.0)
    beat_s = 60.0 / bpm
    n = int(bars * meter * beat_s * sr) + int(0.5 * sr)
    beat_times = np.arange(bars * meter) * beat_s
    bar_starts = beat_times[::meter]

    # --- drums: kick every beat; snare on the meter's backbeats --------
    drums = np.zeros(n)
    kick = resonant_drum("kick", int(0.25 * sr), sr, rng)
    snare = resonant_drum("snare", int(0.18 * sr), sr, rng)
    hat = resonant_drum("hat", int(0.06 * sr), sr, rng)
    snare_beats = {4: (1, 3), 3: ((1,) if rng.random() < 0.5 else (1, 2))}[meter]
    hat_eighths = bool(rng.random() < 0.4)  # else off-beats only
    kick_g = float(rng.uniform(0.8, 1.0))
    snare_g = float(rng.uniform(0.4, 0.6))
    hat_g = float(rng.uniform(0.3, 0.5))
    for bi, t in enumerate(beat_times):
        s = int(t * sr)
        drums[s : s + kick.size] += kick_g * kick[: n - s]
        if bi % meter in snare_beats:
            drums[s : s + snare.size] += snare_g * snare[: n - s]
        offs = (0.25, 0.5, 0.75) if hat_eighths else (0.5,)
        for off in offs:
            hs = int((t + off * beat_s) * sr)
            if hs < n:
                drums[hs : hs + hat.size] += hat_g * hat[: n - hs]

    # --- harmony: a walk whose ROOT moves every bar ---------------------
    # Degrees in semitones relative to the key; quality per degree.
    walks = [
        ([0, -4, 3, -2], ["min", "maj", "maj", "maj"]),   # i-VI-III-VII (minor)
        ([0, 5, 7, 5], ["maj", "maj", "maj", "maj"]),     # I-IV-V-IV (major)
        ([0, -3, 5, 7], ["min", "maj", "maj", "maj"]),    # i-bVI.. style
        ([0, 7, -4, 5], ["maj", "maj", "min", "maj"]),    # I-V-vi-IV
    ]
    walk_deg, walk_qual = walks[int(rng.integers(0, len(walks)))]
    root_hz = 55.0 * tf  # A1 transposed

    bass = np.zeros(n)
    bass_wave = str(rng.choice(["square", "saw", "triangle"]))
    for bar in range(bars):
        f = root_hz * 2.0 ** (walk_deg[bar % 4] / 12.0)
        for bi in range(meter):
            s = int((bar * meter + bi) * beat_s * sr)
            dur = int(0.9 * beat_s * sr)
            if s >= n:
                break
            note = osc(bass_wave, f, min(dur, n - s), sr)
            note = biquad(note, *_rbj_lowpass(400.0 * tf, 0.8, sr))
            bass[s : s + note.size] += note * adsr(note.size, sr, 0.004, 0.08, 0.55, 0.1)

    def _chord_freqs(deg: int, qual: str) -> tuple:
        base = 220.0 * tf * 2.0 ** (deg / 12.0)
        third = base * 2.0 ** ((3 if qual == "min" else 4) / 12.0)
        fifth = base * 2.0 ** (7 / 12.0)
        return (base, third, fifth)

    other = np.zeros(n)
    comp_style = str(rng.choice(["ands", "beats", "pad"]))
    chord_wave = str(rng.choice(["saw", "organ"]))
    for bar in range(bars):
        freqs = _chord_freqs(walk_deg[bar % 4], walk_qual[bar % 4])
        if comp_style == "pad":
            s = int(bar * meter * beat_s * sr)
            dur = int(meter * beat_s * sr)
            if s >= n:
                break
            pad = sum(osc(chord_wave, f, min(dur, n - s), sr, phase0=0.13 * i) for i, f in enumerate(freqs))
            other[s : s + pad.size] += 0.28 * pad * adsr(pad.size, sr, 0.05, 0.2, 0.7, 0.3)
        else:
            offs = (
                [b + 0.5 for b in range(meter)]
                if comp_style == "ands"
                else list(range(meter))
            )
            for off in offs:
                s = int((bar * meter + off) * beat_s * sr)
                dur = int(0.45 * beat_s * sr)
                if s >= n:
                    break
                stab = sum(osc(chord_wave, f, min(dur, n - s), sr, phase0=0.13 * i) for i, f in enumerate(freqs))
                other[s : s + stab.size] += 0.33 * stab * adsr(stab.size, sr, 0.01, 0.1, 0.4, 0.12)

    vocals = np.zeros(n)
    has_vocals = bool(rng.random() < 0.7)
    if has_vocals:
        phrase_beats = 2 * meter
        mel_deg = [0, 2, 3, 0] if walk_qual[0] == "min" else [0, 2, 4, 0]
        melody = [220.0 * tf * 2.0 ** (d / 12.0) for d in mel_deg]
        for bar in range(0, bars - 1, 4):
            s = int(bar * meter * beat_s * sr)
            dur = int(phrase_beats * beat_s * sr)
            if s + dur > n:
                break
            f0 = np.concatenate(
                [np.full(dur // len(melody), f) for f in melody]
                + [np.full(dur - 4 * (dur // 4), melody[-1])]
            )[:dur]
            vocals[s : s + dur] += vocal_phrase(f0, dur, sr, ["a", "i", "o", "e"])

    stems = {
        "drums": 0.9 * drums,
        "bass": float(rng.uniform(0.4, 0.6)) * bass / (np.max(np.abs(bass)) or 1.0),
        "other": float(rng.uniform(0.35, 0.55)) * other / (np.max(np.abs(other)) or 1.0),
        "vocals": (0.5 * vocals / (np.max(np.abs(vocals)) or 1.0)) if has_vocals else vocals,
    }
    mix = schroeder_reverb(sum(stems.values()), sr, wet=float(rng.uniform(0.06, 0.16)))
    peak = np.max(np.abs(mix)) or 1.0
    scale = 0.9 / peak
    mix = (mix * scale).astype(np.float32)
    stems = {k: (v * scale).astype(np.float32) for k, v in stems.items()}
    meta = {
        "bpm": bpm,
        "meter": meter,
        "transpose": transpose,
        "walk": walk_deg,
        "comp": comp_style,
        "vocals": has_vocals,
        "hat_eighths": hat_eighths,
    }
    return stems, mix, beat_times.astype(np.float64), bar_starts.astype(np.float64), meta


def render_song(
    sr: int = 22_050,
    bpm: float = 123.0,
    bars: int = 24,
    seed: int = 20_260_819,
) -> tuple:
    """Render a four-stem arrangement with known beat/bar ground truth.

    Returns ``(stems: dict name -> (n,) mono f32, mix (n,) f32,
    beat_times (B,), bar_start_times (bars,))``. The drum pattern keeps
    kick on every beat (house idiom) with snare backbeats and off-beat
    hats; bass plays a I-VI-III-VII walk; chords comp on the "and"s; the
    vocal phrase enters every 4 bars.
    """

    rng = np.random.default_rng(seed)
    beat_s = 60.0 / bpm
    n = int(bars * 4 * beat_s * sr) + int(0.5 * sr)
    beat_times = np.arange(bars * 4) * beat_s
    bar_starts = beat_times[::4]

    drums = np.zeros(n)
    kick = resonant_drum("kick", int(0.25 * sr), sr, rng)
    snare = resonant_drum("snare", int(0.18 * sr), sr, rng)
    hat = resonant_drum("hat", int(0.06 * sr), sr, rng)
    for bi, t in enumerate(beat_times):
        s = int(t * sr)
        drums[s : s + kick.size] += 0.95 * kick[: n - s]
        if bi % 4 in (1, 3):
            drums[s : s + snare.size] += 0.5 * snare[: n - s]
        hs = int((t + 0.5 * beat_s) * sr)
        if hs < n:
            drums[hs : hs + hat.size] += 0.4 * hat[: n - hs]

    # I-VI-III-VII walk in A minor: A1, F1(+oct), C2, G1
    bass_roots = [55.0, 43.65 * 2, 65.41, 49.0]
    bass = np.zeros(n)
    for bar in range(bars):
        root = bass_roots[bar % 4]
        for bi in range(4):
            s = int((bar * 4 + bi) * beat_s * sr)
            dur = int(0.9 * beat_s * sr)
            if s >= n:
                break
            note = osc("square", root, min(dur, n - s), sr)
            note = biquad(note, *_rbj_lowpass(400.0, 0.8, sr))
            bass[s : s + note.size] += note * adsr(note.size, sr, 0.004, 0.08, 0.55, 0.1)

    chord_sets = [
        (220.0, 261.63, 329.63),  # Am
        (174.61, 220.0, 261.63),  # F
        (261.63, 329.63, 392.0),  # C
        (196.0, 246.94, 293.66),  # G
    ]
    other = np.zeros(n)
    for bar in range(bars):
        freqs = chord_sets[bar % 4]
        for off in (0.5, 1.5, 2.5, 3.5):  # comp on the "and"s
            s = int((bar * 4 + off) * beat_s * sr)
            dur = int(0.45 * beat_s * sr)
            if s >= n:
                break
            stab = sum(osc("saw", f, min(dur, n - s), sr, phase0=0.13 * i) for i, f in enumerate(freqs))
            other[s : s + stab.size] += 0.33 * stab * adsr(stab.size, sr, 0.01, 0.1, 0.4, 0.12)

    vocals = np.zeros(n)
    phrase_beats = 8
    melody = [220.0, 246.94, 261.63, 220.0]
    for bar in range(0, bars - 1, 4):
        s = int(bar * 4 * beat_s * sr)
        dur = int(phrase_beats * beat_s * sr)
        if s + dur > n:
            break
        f0 = np.concatenate(
            [np.full(dur // len(melody), f) for f in melody] + [np.full(dur - 4 * (dur // 4), melody[-1])]
        )[:dur]
        vocals[s : s + dur] += vocal_phrase(f0, dur, sr, ["a", "i", "o", "e"])

    stems = {
        "drums": 0.9 * drums,
        "bass": 0.5 * bass / (np.max(np.abs(bass)) or 1.0),
        "other": 0.45 * other / (np.max(np.abs(other)) or 1.0),
        "vocals": 0.5 * vocals / (np.max(np.abs(vocals)) or 1.0),
    }
    mix = schroeder_reverb(sum(stems.values()), sr)
    peak = np.max(np.abs(mix)) or 1.0
    scale = 0.9 / peak
    mix = (mix * scale).astype(np.float32)
    stems = {k: (v * scale).astype(np.float32) for k, v in stems.items()}
    return stems, mix, beat_times.astype(np.float64), bar_starts.astype(np.float64)
