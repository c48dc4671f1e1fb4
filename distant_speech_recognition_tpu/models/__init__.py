from . import (  # noqa: F401
    adaptive_gsc,
    aec,
    beamforming,
    dereverberation,
    localization,
    pipeline,
    postfilter,
    tracking,
)
