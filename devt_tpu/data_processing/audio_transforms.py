"""Audio extraction + augmentation.

Capability twin of src/data_processing/transforms/audio_transforms.py:14-29:
the reference ffmpeg-extracts the first second of mono PCM then augments
with librosa/audiomentations (Gaussian noise, pitch shift).  Neither
librosa nor an ffmpeg binary ships here, so:

  * :func:`extract_pcm` shells out to ffmpeg when present (same mono/1-s
    contract), else raises with guidance;
  * the augmentations are numpy-native and operate on any PCM array.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np


def extract_pcm(video_path: str, seconds: float = 1.0,
                sample_rate: int = 16000) -> np.ndarray:
    """First ``seconds`` of mono PCM via ffmpeg (audio_transforms.py:21-26)."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg binary not found — extract PCM externally "
                           "and pass arrays to the augment functions")
    out = subprocess.run(
        [ffmpeg, "-i", video_path, "-t", str(seconds), "-ac", "1",
         "-ar", str(sample_rate), "-f", "f32le", "-"],
        check=True, capture_output=True)
    return np.frombuffer(out.stdout, np.float32).copy()


def add_gaussian_noise(pcm: np.ndarray, rng: np.random.Generator,
                       min_amp: float = 0.001, max_amp: float = 0.015
                       ) -> np.ndarray:
    """audiomentations ``AddGaussianNoise`` semantics: noise amplitude
    drawn uniformly per call (audio_transforms.py:15-17)."""
    amp = rng.uniform(min_amp, max_amp)
    return pcm + amp * rng.standard_normal(pcm.shape).astype(pcm.dtype)


def pitch_shift(pcm: np.ndarray, semitones: float,
                sample_rate: int = 16000) -> np.ndarray:
    """Pitch shift keeping duration (audio_transforms.py:18 intent).

    Phase-naive speed-change implementation adequate for augmentation:
    resample by the pitch factor (which changes pitch *and* duration),
    then restore the length by tiling (pitch up leaves spare signal that
    loops) or truncating (pitch down).  A phase-vocoder would preserve
    content alignment exactly; for 1-second augmentation clips the loop
    seam is immaterial."""
    factor = 2.0 ** (semitones / 12.0)
    n = len(pcm)
    # read the signal at `factor`× speed: y[i] = pcm[i * factor]
    positions = np.arange(int(np.floor((n - 1) / factor)) + 1) * factor
    sped = np.interp(positions, np.arange(n), pcm.astype(np.float64))
    if len(sped) >= n:
        out = sped[:n]
    else:
        reps = int(np.ceil(n / len(sped)))
        out = np.tile(sped, reps)[:n]
    return out.astype(pcm.dtype)


def random_pitch_shift(pcm: np.ndarray, rng: np.random.Generator,
                       min_semitones: float = -4.0,
                       max_semitones: float = 4.0,
                       sample_rate: int = 16000) -> np.ndarray:
    return pitch_shift(pcm, rng.uniform(min_semitones, max_semitones),
                       sample_rate)
