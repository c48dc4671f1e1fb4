"""Synthetic test-signal generation.

Batch equivalent of lib/signal_generator.py (sine/impulse/triangle/function
sources used to exercise filterbanks and beamformers) plus a far-field
multichannel plane-wave simulator for array tests.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sine_wave",
    "chirp",
    "impulse_train",
    "triangle_wave",
    "white_noise",
    "function_signal",
    "plane_wave_array",
]


def sine_wave(num_samples, freq_hz, samplerate=16000.0, amplitude=1.0, phase=0.0):
    t = np.arange(num_samples) / samplerate
    return (amplitude * np.sin(2 * np.pi * freq_hz * t + phase)).astype(np.float32)


def chirp(num_samples, f0_hz, f1_hz, samplerate=16000.0, amplitude=1.0):
    t = np.arange(num_samples) / samplerate
    T = num_samples / samplerate
    k = (f1_hz - f0_hz) / T
    return (amplitude * np.sin(2 * np.pi * (f0_hz * t + 0.5 * k * t * t))).astype(np.float32)


def impulse_train(num_samples, period, amplitude=1.0):
    x = np.zeros(num_samples, np.float32)
    x[::period] = amplitude
    return x


def triangle_wave(num_samples, period, amplitude=1.0):
    n = np.arange(num_samples) % period
    half = period / 2.0
    return (amplitude * (1.0 - np.abs(n - half) / half)).astype(np.float32)


def white_noise(num_samples, sigma=1.0, seed=0):
    return (np.random.default_rng(seed).standard_normal(num_samples) * sigma).astype(np.float32)


def function_signal(num_samples, f, a=lambda x: 1.0, b=lambda x: 1.0, c=lambda x: 0.0):
    """Generalized function feature ``y(x) = a(x) f(b(x) x) + c(x)``
    (FunctionFeature, signal_generator.py:210-268)."""
    x = np.arange(num_samples, dtype=np.float64)
    return (a(x) * f(b(x) * x) + c(x)).astype(np.float32)


def plane_wave_array(source, mpos, azimuth, polar=np.pi / 2, samplerate=16000.0,
                     sspeed=343740.0, snr_db=None, seed=0):
    """Delay a mono source onto an array far-field: [C, T].

    Fractional delays are applied in the frequency domain; optional white
    noise at the given SNR.
    """
    from . import geometry

    mpos = np.asarray(mpos, dtype=np.float64)
    delays = geometry.calc_ca_delays(
        np.c_[mpos, np.zeros((len(mpos), max(0, 3 - mpos.shape[1])))], azimuth, polar, sspeed
    )
    T = len(source)
    S = np.fft.rfft(source)
    freqs = np.fft.rfftfreq(T, 1.0 / samplerate)
    out = np.stack([
        np.fft.irfft(S * np.exp(-2j * np.pi * freqs * d), n=T) for d in delays
    ]).astype(np.float32)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        p_sig = np.mean(out**2)
        sigma = np.sqrt(p_sig / (10 ** (snr_db / 10.0)))
        out = out + rng.standard_normal(out.shape).astype(np.float32) * sigma
    return out
