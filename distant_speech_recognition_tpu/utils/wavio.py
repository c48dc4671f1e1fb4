"""WAV audio I/O on the host.

Replaces the libsndfile-based ``SampleFeature`` reader of the reference
(feature/feature.cc:241-330).  int16 PCM is normalized to float by 1/32768,
matching libsndfile's float conversion used there, so energies printed by the
reference unit tests are directly comparable.
"""

from __future__ import annotations

import wave

import numpy as np

__all__ = ["read_wav", "write_wav", "frame_blocks"]

_INT16_SCALE = 32768.0


def read_wav(path: str, normalize: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (samples ``[channels, T]`` float32, sample_rate)."""
    with wave.open(path, "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
        if normalize:
            data /= _INT16_SCALE
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32)
        if normalize:
            data /= 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0)
        if normalize:
            data /= 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return data.reshape(-1, nch).T.copy(), rate


def write_wav(path: str, samples: np.ndarray, rate: int, normalized: bool = True) -> None:
    """Write float samples ``[T]`` or ``[channels, T]`` as 16-bit PCM."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[None]
    data = samples.T
    if normalized:
        data = data * _INT16_SCALE
    pcm = np.clip(np.round(data), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(samples.shape[0])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def frame_blocks(x: np.ndarray, block_len: int, shift_len: int | None = None,
                 pad_zeros: bool = True) -> np.ndarray:
    """Frame a 1-D signal into blocks (``SampleFeature::next``, feature.cc:605-648).

    With ``pad_zeros`` the last partial block is zero-padded; otherwise it is
    dropped.  Returns ``[n_blocks, block_len]``.
    """
    if shift_len is None:
        shift_len = block_len
    x = np.asarray(x)
    T = len(x)
    if pad_zeros:
        n = -(-T // shift_len)
    else:
        n = max((T - block_len) // shift_len + 1, 0)
    out = np.zeros((n, block_len), dtype=x.dtype)
    for i in range(n):
        seg = x[i * shift_len : i * shift_len + block_len]
        out[i, : len(seg)] = seg
    return out
