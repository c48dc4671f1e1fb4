from . import geometry, kaldi_io, measures, prototypes, wavio  # noqa: F401
