from . import cosine_modulated, nyquist  # noqa: F401
