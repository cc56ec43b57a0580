"""Numpy reference for the SoundSpaces audio observation pipeline.

Matches the semantics of the reference platform's sensors:
- `SpectrogramSensor.compute_spectrogram` (reference soundspaces/tasks/nav.py:86-100):
  librosa.stft(n_fft=512, hop=160, win=400) magnitude -> skimage.block_reduce
  (4,4) mean -> log1p -> stack 2 channels last.
- `SoundSpacesSim._compute_audiogoal` (reference soundspaces/simulator.py:608-666):
  scipy fftconvolve of the source waveform with the per-pose binaural RIR,
  sliced to the current one-second window, with "reverb from previous step"
  carried in via a valid-mode convolution over an extended segment.

librosa / skimage are NOT imported; their exact numerics are re-implemented
here (librosa 0.8-0.10 STFT: periodic hann, window center-padded to n_fft,
reflect-padded centered frames).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import fftconvolve


def hann_window_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann window, identical to
    scipy.signal.get_window('hann', win_length, fftbins=True), which is what
    librosa.stft uses by default."""
    n = np.arange(win_length)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def stft_magnitude(
    signal: np.ndarray,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
) -> np.ndarray:
    """|STFT| with librosa semantics (center=True, reflect padding, periodic
    hann window zero-padded centered to n_fft). Returns [1 + n_fft//2, frames]."""
    window = hann_window_periodic(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))

    y = np.pad(signal, n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    frames = np.stack(
        [y[i * hop_length : i * hop_length + n_fft] for i in range(n_frames)], axis=1
    )
    spec = np.fft.rfft(frames * window[:, None], n=n_fft, axis=0)
    return np.abs(spec)


def block_reduce_mean(x: np.ndarray, block: tuple[int, int] = (4, 4)) -> np.ndarray:
    """skimage.measure.block_reduce(x, block, func=np.mean, cval=0):
    zero-pad each axis at the END to a multiple of the block size, then mean
    over non-overlapping blocks (padding zeros are included in the mean)."""
    ph = (-x.shape[0]) % block[0]
    pw = (-x.shape[1]) % block[1]
    x = np.pad(x, ((0, ph), (0, pw)))
    h, w = x.shape[0] // block[0], x.shape[1] // block[1]
    return x.reshape(h, block[0], w, block[1]).mean(axis=(1, 3))


def compute_spectrogram(audio_data: np.ndarray) -> np.ndarray:
    """Binaural audiogoal [2, n_samples] -> spectrogram [F//4⌉, T//4⌉, 2].

    Reference: SpectrogramSensor.compute_spectrogram
    (soundspaces/tasks/nav.py:86-100)."""

    def _one(ch: np.ndarray) -> np.ndarray:
        return np.log1p(block_reduce_mean(stft_magnitude(ch)))

    return np.stack([_one(audio_data[0]), _one(audio_data[1])], axis=-1).astype(
        np.float32
    )


def sliding_window_audiogoal(
    source: np.ndarray,
    binaural_rir: np.ndarray,
    audio_index: int,
    sampling_rate: int,
) -> np.ndarray:
    """The reference discrete-sim audiogoal computation
    (soundspaces/simulator.py:628-647) for one step.

    source: mono waveform [n_samples] (n_samples a multiple of sampling_rate).
    binaural_rir: [rir_len, 2].
    Returns [2, sampling_rate].
    """
    sr = sampling_rate
    if source.shape[0] == sr:
        conv = np.array(
            [fftconvolve(source, binaural_rir[:, c]) for c in range(2)]
        )
        return conv[:, :sr]
    index = audio_index
    if index * sr - binaural_rir.shape[0] < 0:
        seg = source[: (index + 1) * sr]
        conv = np.array([fftconvolve(seg, binaural_rir[:, c]) for c in range(2)])
        return conv[:, index * sr : (index + 1) * sr]
    seg = source[index * sr - binaural_rir.shape[0] + 1 : (index + 1) * sr]
    conv = np.array(
        [fftconvolve(seg, binaural_rir[:, c], mode="valid") for c in range(2)]
    )
    return conv


def continuous_windowed_audiogoal(
    source: np.ndarray,
    rir: np.ndarray,
    sample_index: int,
    sampling_rate: int,
    step_time: float,
) -> np.ndarray:
    """Reference continuous-sim windowed convolution with wraparound
    (soundspaces/continuous_simulator.py:428-456). Returns [2, sampling_rate]
    (zero-padded past the step window)."""
    sr = sampling_rate
    num_sample = int(sr * step_time)
    index = sample_index
    if index - rir.shape[0] < 0:
        seg = source[: index + num_sample]
        conv = np.array([fftconvolve(seg, rir[:, c]) for c in range(2)])
        out = conv[:, index : index + num_sample]
    else:
        if index + num_sample < source.shape[0]:
            seg = source[index - rir.shape[0] + 1 : index + num_sample]
        else:
            wrap = index + num_sample - source.shape[0]
            seg = np.concatenate([source[index - rir.shape[0] + 1 :], source[:wrap]])
        conv = np.array([fftconvolve(seg, rir[:, c], mode="valid") for c in range(2)])
        out = conv
    return np.pad(out, [(0, 0), (0, sr - out.shape[1])])


def crossfade(x1: np.ndarray, x2: np.ndarray, sr: int) -> np.ndarray:
    """50 ms linear crossfade between two binaural signals
    (reference soundspaces/continuous_simulator.py:47-53)."""
    n = int(0.05 * sr)
    w2 = np.arange(n + 1) / n
    w1 = np.flip(w2)
    head = x1[:, : n + 1] * w1 + x2[:, : n + 1] * w2
    return np.concatenate([head, x2[:, n + 1 :]], axis=1)
