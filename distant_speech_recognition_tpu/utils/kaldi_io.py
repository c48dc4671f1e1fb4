"""Kaldi ark/scp I/O (host side).

Binary-compatible with the reference's readers/writers
(lib/pykaldiarkio.py): float feature matrices ('BFM '), int vectors ('B'),
and RIFF wav arks, plus scp position files.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "read_feat_ark",
    "write_feat_ark",
    "read_int_vector_ark",
    "write_int_vector_ark",
    "read_wav_ark",
    "write_wav_ark",
    "read_scp",
]

BFM_SYM = b"BFM "
BIV_SYM = b"B"
WAV_SYM = b"RIFF"


def _read_token(f):
    """Read a space-terminated utterance id; None at EOF."""
    uttid = b""
    while True:
        c = f.read(1)
        if c == b"":
            return None
        if c == b" ":
            return uttid.decode()
        uttid += c


def read_feat_ark(path):
    """Yield (uttid, float32 matrix [frames, dim]) from a .feat.ark
    (KaldiFeatArkReader, pykaldiarkio.py:112-155)."""
    with open(path, "rb") as f:
        while True:
            uttid = _read_token(f)
            if uttid is None:
                return
            f.read(1)  # '\0'
            sym = f.read(4)
            if sym != BFM_SYM:
                raise ValueError(f"{path}: expected BFM, got {sym!r}")
            f.read(1)
            (frame_n,) = struct.unpack("<I", f.read(4))
            f.read(1)
            (feat_d,) = struct.unpack("<I", f.read(4))
            data = np.frombuffer(f.read(frame_n * feat_d * 4), dtype="<f4")
            yield uttid, data.reshape(frame_n, feat_d).copy()


def write_feat_ark(path, utts):
    """``utts``: iterable of (uttid, matrix) or dict (KaldiFeatArkWriter)."""
    items = utts.items() if hasattr(utts, "items") else utts
    with open(path, "wb") as f:
        for uttid, mat in items:
            mat = np.asarray(mat, dtype="<f4")
            f.write(uttid.encode() + b" \0" + BFM_SYM)
            f.write(b"\x04" + struct.pack("<I", mat.shape[0]))
            f.write(b"\x04" + struct.pack("<I", mat.shape[1]))
            f.write(mat.tobytes())


def read_int_vector_ark(path):
    """Yield (uttid, int vector) (KaldiIntVectorArkReader,
    pykaldiarkio.py:158-201)."""
    with open(path, "rb") as f:
        while True:
            uttid = _read_token(f)
            if uttid is None:
                return
            f.read(1)
            if f.read(1) != BIV_SYM:
                raise ValueError(f"{path}: bad int-vector symbol")
            f.read(1)
            (frame_n,) = struct.unpack("<i", f.read(4))
            vals = np.empty(frame_n, np.int32)
            for i in range(frame_n):
                f.read(1)
                (vals[i],) = struct.unpack("<i", f.read(4))
            yield uttid, vals


def write_int_vector_ark(path, utts):
    items = utts.items() if hasattr(utts, "items") else utts
    with open(path, "wb") as f:
        for uttid, vec in items:
            vec = np.asarray(vec, np.int32)
            f.write(uttid.encode() + b" \0" + BIV_SYM)
            f.write(b"\x04" + struct.pack("<i", len(vec)))
            for v in vec:
                f.write(b"\x04" + struct.pack("<i", int(v)))


def _riff_header(num_samples, samplerate, num_channels=1):
    data_len = num_samples * 2
    return (
        b"RIFF"
        + struct.pack("<L", 36 + data_len)
        + b"WAVEfmt "
        + struct.pack("<LhhLLhh", 16, 1, num_channels, samplerate,
                      samplerate * num_channels * 2, num_channels * 2, 16)
        + b"data"
        + struct.pack("<L", data_len)
    )


def read_wav_ark(path):
    """Yield (uttid, int16 samples, samplerate) (KaldiWavArkReader,
    pykaldiarkio.py:204-268)."""
    with open(path, "rb") as f:
        while True:
            uttid = _read_token(f)
            if uttid is None:
                return
            header = f.read(44)
            if header[:4] != WAV_SYM:
                raise ValueError(f"{path}: bad RIFF header")
            (data_len,) = struct.unpack("<L", header[40:44])
            (bits,) = struct.unpack("<h", header[34:36])
            (rate,) = struct.unpack("<L", header[24:28])
            if bits != 16:
                raise ValueError(f"{path}: expected 16-bit, got {bits}")
            samples = np.frombuffer(f.read(data_len), dtype="<i2").copy()
            yield uttid, samples, rate


def write_wav_ark(path, utts, samplerate=16000):
    """``utts``: iterable of (uttid, int16 samples) (KaldiWavArkWriter)."""
    items = utts.items() if hasattr(utts, "items") else utts
    with open(path, "wb") as f:
        for uttid, samples in items:
            samples = np.asarray(samples, dtype="<i2")
            f.write(uttid.encode() + b" ")
            f.write(_riff_header(len(samples), samplerate))
            f.write(samples.tobytes())


def read_scp(path):
    """Parse 'uttid ark_path:offset' lines -> list of (uttid, path, offset)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            uttid, loc = line.split(None, 1)
            if ":" in loc:
                ark, off = loc.rsplit(":", 1)
                out.append((uttid, ark, int(off)))
            else:
                out.append((uttid, loc, 0))
    return out
