from . import (  # noqa: F401
    adaptive_gsc,
    aec,
    beamforming,
    dereverberation,
    features,
    localization,
    lpc,
    lti,
    pipeline,
    postfilter,
    sad,
    tracking,
)
