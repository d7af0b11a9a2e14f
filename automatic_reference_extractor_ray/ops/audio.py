"""Audio feature extraction — a REAL (non-stubbed) multimodal decode
path: WAV is a stdlib-parseable container (`wave` + numpy), so unlike
the image/OCR seams (PIL/tesseract are container blockers, see
BASELINE.md) this stage decodes genuine audio bytes end-to-end.

Pattern is the multimodal contract (`ops/multimodal.py` /
`sources/media_store.py`): an audio span carries only its
``audio_ref`` string; the actor resolves ref → WAV bytes INSIDE the
pool (payloads never enter Dataset blocks or shuffles), decodes with
the stdlib ``wave`` reader, and computes vectorized int16 DSP
features.  Features are exact integers / micro-quantized so output is
order- and partition-independent:

    n_samples, sample_rate, duration_ms  — container facts
    rms_micro   — sqrt(mean(x²)) / 32768 in micro-units
    zcr_micro   — zero-crossing fraction in micro-units
    peak        — max |sample| (int)
    centroid_hz — spectral centroid Σf·|X(f)| / Σ|X(f)| (rfft), int Hz

``SynthAudioStore`` regenerates deterministic PCM procedurally from
the ref (seeded sine mix + uniform noise — PCG64, no wall-clock), so
tests and bench need zero storage, mirroring ``SynthMediaStore``.

Model-based decode → no SQL oracle; pinned by an independent
pure-Python (struct-only, no wave/numpy) decoder in tests plus
closed-form cases (silence → rms 0; full-scale square → rms 1e6,
peak 32767).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pandas as pd


def synth_wav_bytes(seed: int, n_samples: int = 8000,
                    sample_rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV: two seeded sine partials +
    uniform noise, int16-quantized."""
    rng = np.random.Generator(np.random.PCG64(seed))
    f1 = float(rng.integers(80, 800))
    f2 = float(rng.integers(800, 3200))
    a1 = float(rng.uniform(0.2, 0.6))
    a2 = float(rng.uniform(0.05, 0.3))
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    x = (a1 * np.sin(2 * np.pi * f1 * t)
         + a2 * np.sin(2 * np.pi * f2 * t)
         + rng.uniform(-0.05, 0.05, n_samples))
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioStore:
    def fetch(self, audio_ref: str) -> bytes:
        raise NotImplementedError


class SynthAudioStore(AudioStore):
    """``synthwav://<seed>/<n_samples>/<rate>`` → deterministic WAV."""

    def fetch(self, audio_ref: str) -> bytes:
        if not audio_ref.startswith("synthwav://"):
            raise ValueError(f"not a synthwav ref: {audio_ref!r}")
        seed, n, rate = (int(p) for p in
                         audio_ref[len("synthwav://"):].split("/"))
        return synth_wav_bytes(seed, n, rate)


def make_audio_store(spec: str) -> AudioStore:
    if spec == "synthwav":
        return SynthAudioStore()
    raise ValueError(f"unknown audio store spec {spec!r}")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate) via the stdlib
    reader (multi-channel folds to the first channel)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        x = x[::nch]
    return x, rate


def wav_features(payload: bytes) -> dict:
    """One WAV payload → the exact-integer feature dict."""
    x, rate = decode_wav(payload)
    n = len(x)
    if n == 0:
        return {"n_samples": 0, "sample_rate": rate, "duration_ms": 0,
                "rms_micro": 0, "zcr_micro": 0, "peak": 0,
                "centroid_hz": 0}
    xf = x.astype(np.float64)
    rms = float(np.sqrt(np.mean(xf * xf))) / 32768.0
    signs = x >= 0
    zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
    mag = np.abs(np.fft.rfft(xf))
    msum = float(mag.sum())
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((freqs * mag).sum() / msum) if msum > 0 else 0.0
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_ms": n * 1000 // rate,
        "rms_micro": int(np.floor(rms * 1_000_000.0 + 0.5)),
        "zcr_micro": zc * 1_000_000 // max(1, n - 1),
        "peak": int(np.max(np.abs(xf))),
        "centroid_hz": int(np.floor(centroid + 0.5)),
    }


class AudioFeatures:
    """Actor-pool stage: (audio_ref) rows → one feature row each.
    Store built once per actor in ``__init__`` (the warm-cache
    contract); payload bytes live only inside the actor."""

    def __init__(self, store_spec: str = "synthwav"):
        self.store = make_audio_store(store_spec)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = [wav_features(self.store.fetch(r))
                for r in batch["audio_ref"]]
        out = pd.DataFrame(rows, columns=["n_samples", "sample_rate",
                                          "duration_ms", "rms_micro",
                                          "zcr_micro", "peak",
                                          "centroid_hz"])
        out.insert(0, "audio_ref", batch["audio_ref"].to_numpy())
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out


def audio_features(audio_refs_ds, store_spec: str = "synthwav",
                   concurrency=(2, 8), batch_size: int = 64):
    """audio_ref Dataset → (audio_ref, n_samples, sample_rate,
    duration_ms, rms_micro, zcr_micro, peak, centroid_hz) via the
    actor pool.
    Small batches: each row fans into an in-actor decode whose
    payload is ~100× the ref string — the media batch-size rule."""
    return audio_refs_ds.map_batches(
        AudioFeatures, fn_constructor_args=(store_spec,),
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pandas")
