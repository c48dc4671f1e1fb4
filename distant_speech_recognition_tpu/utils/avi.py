"""Host-side AVI video ingest (the reference's ``VideoFeature`` file path).

The reference decodes AVI via OpenCV/ffmpeg (``cvCreateFileCapture``,
feature/videofeature.cc:96-141) and feeds per-frame vectors into the image
ops.  Here the decode is a pure-Python RIFF parser (no OpenCV/ffmpeg in the
image): uncompressed DIB frames (BI_RGB 24/32-bit and 8-bit grayscale) are
unpacked directly, and MJPG streams decode through Pillow.  The decoded
``[N, H, W, 3]`` uint8 RGB frames feed ``models.video.video_frames`` for the
reference's exact feature layout (gray / stacked-RGB, width-major flatten).

``avi_frame_count`` mirrors the reference's raw header peek
(``VideoFeature::Frames`` reads the dwTotalFrames field at byte 0x30,
videofeature.cc:127-141).  ``write_avi`` emits a minimal uncompressed AVI
(used by tests and for exporting enhanced frame streams).
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass

import numpy as np

__all__ = [
    "AviInfo",
    "avi_info",
    "avi_frame_count",
    "read_avi",
    "iter_avi_frames",
    "write_avi",
]


@dataclass(frozen=True)
class AviInfo:
    width: int
    height: int
    total_frames: int
    us_per_frame: int
    compression: str  # "" (BI_RGB), "MJPG", ...
    bit_count: int

    @property
    def fps(self) -> float:
        return 1e6 / self.us_per_frame if self.us_per_frame else 0.0


def _chunks(buf: memoryview, pos: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fcc = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _parse(path: str):
    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"{path}: not a RIFF AVI file")

    info = {"us_per_frame": 0, "total_frames": 0, "width": 0, "height": 0,
            "compression": "", "bit_count": 24}
    movi_frames: list[tuple[int, int]] = []  # (start, size) of 00db/00dc
    # Stream context: each strl LIST holds a strh (type) then its strf; the
    # video strf must be matched to the 'vids' strh, not keyed on parse
    # state — an audio WAVEFORMATEX strf would otherwise clobber the video
    # fields (or be misread as a BITMAPINFOHEADER).
    last_strh_type = b""
    strf_parsed = False

    def collect_movi(pos, end):
        for cfcc, cp, csize in _chunks(buf, pos, end):
            # first video stream's data chunks: ##db (uncompressed) or
            # ##dc (compressed); ignore audio (##wb) and index.  Interleaved
            # AVIs may group chunks inside 'rec ' LISTs — recurse into them.
            if cfcc == b"LIST" and bytes(buf[cp : cp + 4]) == b"rec ":
                collect_movi(cp + 4, cp + csize)
            elif cfcc[2:4] in (b"db", b"dc"):
                movi_frames.append((cp, csize))

    def walk(pos, end):
        nonlocal last_strh_type, strf_parsed
        for fcc, p, size in _chunks(buf, pos, end):
            if fcc == b"LIST":
                ltype = bytes(buf[p : p + 4])
                if ltype == b"movi":
                    collect_movi(p + 4, p + size)
                else:
                    walk(p + 4, p + size)
            elif fcc == b"avih":
                (info["us_per_frame"],) = struct.unpack_from("<I", buf, p)
                (info["total_frames"],) = struct.unpack_from("<I", buf, p + 16)
                info["width"], info["height"] = struct.unpack_from("<II", buf, p + 32)
            elif fcc == b"strh":
                last_strh_type = bytes(buf[p : p + 4])
            elif fcc == b"strf" and last_strh_type == b"vids" and not strf_parsed:
                strf_parsed = True
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, planes,
                # biBitCount, biCompression
                _, w, hgt, _, bits, comp = struct.unpack_from("<IiihhI", buf, p)
                info["bit_count"] = bits
                if comp == 0:
                    info["compression"] = ""
                else:
                    info["compression"] = struct.pack("<I", comp).decode(
                        "ascii", "replace"
                    )

    walk(12, len(data))
    ai = AviInfo(
        width=info["width"], height=info["height"],
        total_frames=info["total_frames"] or len(movi_frames),
        us_per_frame=info["us_per_frame"],
        compression=info["compression"], bit_count=info["bit_count"],
    )
    return ai, data, movi_frames


def avi_info(path: str) -> AviInfo:
    """Header info without decoding any frames."""
    ai, _, _ = _parse(path)
    return ai


def avi_frame_count(path: str) -> int:
    """The reference's raw dwTotalFrames peek at byte 0x30
    (VideoFeature::Frames, videofeature.cc:127-141)."""
    with open(path, "rb") as f:
        f.seek(0x30)
        return struct.unpack("<I", f.read(4))[0]


def _decode_dib(raw: bytes, w: int, h: int, bits: int) -> np.ndarray:
    """Uncompressed DIB frame -> [H, W, 3] uint8 RGB.

    DIB rows are bottom-up and padded to 4-byte boundaries; 24/32-bit pixels
    are stored B,G,R(,X)."""
    stride = (w * (bits // 8) + 3) & ~3
    a = np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride)
    if bits == 8:
        gray = a[:, :w][::-1]
        return np.repeat(gray[..., None], 3, axis=-1)
    px = bits // 8
    bgr = a[:, : w * px].reshape(h, w, px)[::-1, :, :3]
    return bgr[..., ::-1].copy()


def _decode_mjpg(raw: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(raw))
    return np.asarray(img.convert("RGB"))


def iter_avi_frames(path: str, start: int = 0, stop: int | None = None):
    """Yield ``[H, W, 3]`` uint8 RGB frames for index range [start, stop)
    (the ``read(filename, from, to)`` window of videofeature.cc:92-125)."""
    ai, data, frames = _parse(path)
    if stop is None:
        stop = len(frames)
    mjpg = ai.compression.upper().startswith("MJPG")
    for pos, size in frames[start:stop]:
        raw = data[pos : pos + size]
        if mjpg:
            yield _decode_mjpg(raw)
        elif ai.compression == "":
            yield _decode_dib(raw, ai.width, ai.height, ai.bit_count)
        else:
            raise ValueError(
                f"{path}: unsupported AVI compression {ai.compression!r} "
                "(supported: uncompressed BI_RGB, MJPG)"
            )


def read_avi(path: str, start: int = 0, stop: int | None = None) -> np.ndarray:
    """Decode to ``[N, H, W, 3]`` uint8 RGB, ready for
    ``models.video.video_frames`` (gray / stacked-RGB feature layouts)."""
    out = list(iter_avi_frames(path, start, stop))
    if not out:
        ai = avi_info(path)
        return np.zeros((0, ai.height, ai.width, 3), np.uint8)
    return np.stack(out)


def write_avi(path: str, frames: np.ndarray, fps: float = 25.0) -> None:
    """Write ``[N, H, W, 3]`` uint8 RGB as an uncompressed (BI_RGB) AVI."""
    frames = np.asarray(frames, np.uint8)
    n, h, w = frames.shape[:3]
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    strf = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)
    strh = (
        b"vids" + b"\x00" * 4  # fccType, fccHandler (BI_RGB)
        + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, int(round(fps)), 0, n,
                      frame_bytes, 0, 0, 0, 0, w, h)
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    avih = struct.pack(
        "<IIIIIIIIIIIIII", int(1e6 / fps), frame_bytes * int(round(fps)), 0,
        0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = b"movi"
    idx = b""
    offset = 4  # idx1 offsets are relative to the start of 'movi' data
    for fr in frames:
        bgr = fr[::-1, :, ::-1]  # bottom-up rows, B,G,R pixel order
        if stride != w * 3:
            row = np.zeros((h, stride), np.uint8)
            row[:, : w * 3] = bgr.reshape(h, w * 3)
            raw = row.tobytes()
        else:
            raw = bgr.tobytes()
        movi_payload += _chunk(b"00db", raw)
        idx += b"00db" + struct.pack("<III", 0x10, offset, len(raw))
        offset += 8 + len(raw) + (len(raw) & 1)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", idx)

    riff = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def _chunk(fcc: bytes, payload: bytes) -> bytes:
    return fcc + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)
