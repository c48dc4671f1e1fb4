from . import wavio, prototypes  # noqa: F401
