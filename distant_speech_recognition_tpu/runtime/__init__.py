from .native_io import (  # noqa: F401
    NativeStreamReader,
    native_available,
    read_wav_native,
    write_wav_native,
)
