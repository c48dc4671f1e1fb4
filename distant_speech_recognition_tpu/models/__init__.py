from . import beamforming, adaptive_gsc  # noqa: F401
