from . import cosine_modulated, dehaan, nyquist  # noqa: F401
