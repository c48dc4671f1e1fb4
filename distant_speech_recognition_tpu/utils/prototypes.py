"""Filterbank prototype loading/saving.

The reference ships pre-designed Nyquist(M) prototypes as numpy pickles
``h/g-M{M}-m{m}-r{r}.pickle`` (unit_test/prototype.ny/) written by
tools/filterbank/design_nyquist_filter.py.  This module loads those files and
locates them by (M, m, r) convention.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

__all__ = ["load_prototype", "save_prototype", "prototype_path", "load_pair", "write_gsl_format", "read_gsl_format"]

REFERENCE_PROTO_DIR = "/root/reference/btk20_src/unit_test/prototype.ny"


def load_prototype(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        try:
            v = pickle.load(f)
        except UnicodeDecodeError:
            f.seek(0)
            v = pickle.load(f, encoding="latin1")
    return np.asarray(v, dtype=np.float64)


def save_prototype(path: str, proto: np.ndarray) -> None:
    with open(path, "wb") as f:
        pickle.dump(np.asarray(proto, dtype=np.float64), f, protocol=2)


def prototype_path(kind: str, M: int, m: int, r: int, proto_dir: str | None = None) -> str:
    """``kind`` is 'h' (analysis) or 'g' (synthesis)."""
    d = proto_dir or REFERENCE_PROTO_DIR
    return os.path.join(d, f"{kind}-M{M}-m{m}-r{r}.pickle")


def load_pair(M: int, m: int, r: int, proto_dir: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Load (h, g) prototypes for a configuration, designing them on the fly
    if no pickle exists for this (M, m, r)."""
    try:
        h = load_prototype(prototype_path("h", M, m, r, proto_dir))
        g = load_prototype(prototype_path("g", M, m, r, proto_dir))
    except FileNotFoundError:
        from ..design.nyquist import design_nyquist_pair

        h, g = design_nyquist_pair(M, m, r)
    return h, g


def write_gsl_format(path: str, proto) -> None:
    """Raw little-endian float64 dump, binary-compatible with
    ``gsl_vector_fwrite`` as used by ``write_gsl_format``
    (modulated/modulated.cc:624-629)."""
    import numpy as np

    np.asarray(proto, "<f8").tofile(path)


def read_gsl_format(path: str):
    """Inverse of `write_gsl_format` (gsl_vector_fread layout)."""
    import numpy as np

    return np.fromfile(path, "<f8")
