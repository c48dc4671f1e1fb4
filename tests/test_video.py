"""Audio-visual image ops (models/video.py) vs scipy/numpy references."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from distant_speech_recognition_tpu.models import video


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    return (rng.random((12, 16)) * 255.0).astype(np.float32)


def test_flatten_layout_roundtrip(img):
    vec = np.asarray(video.flatten_image(img))
    # reference layout: l = i*height + j with i over width (videofeature.cc:46)
    H, W = img.shape
    manual = np.empty(W * H, np.float32)
    l = 0
    for i in range(W):
        for j in range(H):
            manual[l] = img[j, i]
            l += 1
    np.testing.assert_array_equal(vec, manual)
    back = np.asarray(video.unflatten_image(vec, H, W))
    np.testing.assert_array_equal(back, img)


def test_video_frames_modes():
    rng = np.random.default_rng(0)
    frames = (rng.random((3, 6, 8, 3)) * 255).astype(np.float32)
    gray = np.asarray(video.video_frames(frames, mode=1))
    assert gray.shape == (3, 8 * 6)
    expected = 0.299 * frames[..., 0] + 0.587 * frames[..., 1] + 0.114 * frames[..., 2]
    np.testing.assert_allclose(
        gray, np.asarray(video.flatten_image(expected)), rtol=1e-6
    )
    rgb = np.asarray(video.video_frames(frames, mode=3))
    assert rgb.shape == (3, 3 * 8 * 6)


def test_image_roi(img):
    out = np.asarray(video.image_roi(img, 3, 2, 5, 4))
    np.testing.assert_array_equal(out, img[2:6, 3:8])


def test_image_threshold(img):
    t = 128.0
    np.testing.assert_array_equal(
        np.asarray(video.image_threshold(img, t, 255.0, 0)),
        np.where(img > t, 255.0, 0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(video.image_threshold(img, t, 255.0, 2)),
        np.minimum(img, t),
    )


def test_box_and_gaussian_smooth(img):
    mean = np.asarray(video.image_smooth(img, 1, 3))
    ref = ndi.uniform_filter(img, size=3, mode="nearest")
    np.testing.assert_allclose(mean, ref, rtol=1e-5, atol=1e-4)

    nosc = np.asarray(video.image_smooth(img, 0, 3))
    np.testing.assert_allclose(nosc, ref * 9.0, rtol=1e-5, atol=1e-3)

    gauss = np.asarray(video.image_smooth(img, 2, 5))
    sigma = 0.3 * ((5 - 1) * 0.5 - 1.0) + 0.8
    refg = ndi.gaussian_filter(img, sigma=sigma, mode="nearest", truncate=2.0 / sigma)
    np.testing.assert_allclose(gauss, refg, rtol=2e-3, atol=0.3)


def test_median_smooth(img):
    med = np.asarray(video.image_smooth(img, 3, 3))
    ref = ndi.median_filter(img, size=3, mode="nearest")
    np.testing.assert_allclose(med, ref)


def test_morphology_vs_scipy(img):
    er = np.asarray(video.erode(img))
    di = np.asarray(video.dilate(img))
    np.testing.assert_allclose(er, ndi.grey_erosion(img, size=3, mode="nearest"))
    np.testing.assert_allclose(di, ndi.grey_dilation(img, size=3, mode="nearest"))
    op = np.asarray(video.morphology_ex(img, "open"))
    np.testing.assert_allclose(
        op, ndi.grey_dilation(ndi.grey_erosion(img, size=3, mode="nearest"), size=3, mode="nearest")
    )
    grad = np.asarray(video.morphology_ex(img, "gradient"))
    np.testing.assert_allclose(grad, di - er)
    np.testing.assert_allclose(
        np.asarray(video.morphology_ex(img, "tophat")), img - op
    )


def test_canny_finds_step_edge():
    img = np.zeros((16, 16), np.float32)
    img[:, 8:] = 200.0
    edges = np.asarray(video.canny(img, 50.0, 150.0))
    assert set(np.unique(edges)) <= {0.0, 255.0}
    # the vertical step must be marked, and only near column 7/8
    assert edges[:, 7:9].max() == 255.0
    assert edges[:, :5].max() == 0.0 and edges[:, 11:].max() == 0.0


def test_canny_hysteresis_links_weak_edges():
    # gradient ramp edge: strong in the middle rows, weak elsewhere;
    # hysteresis should keep weak pixels connected to the strong ones
    img = np.zeros((16, 16), np.float32)
    amp = np.linspace(60.0, 200.0, 16, dtype=np.float32)
    img[:, 8:] = amp[:, None]
    edges = np.asarray(video.canny(img, 30.0, 150.0))
    marked_rows = np.where(edges[:, 7:9].max(axis=1) == 255.0)[0]
    assert len(marked_rows) == 16  # weak rows linked via the strong end


def test_linear_interpolation_reference_semantics():
    T, D = 10, 3
    rng = np.random.default_rng(1)
    x = rng.standard_normal((T, D)).astype(np.float32)
    fps_s, fps_d = 25.0, 100.0
    out = np.asarray(video.linear_interpolation(x, fps_s, fps_d))
    # replicate the reference walk (videofeature.cc:1152-1176)
    dts, dtd = 1.0 / fps_s, 1.0 / fps_d
    src = 0
    for n in range(out.shape[0]):
        dest_t = (n + 1) * dtd
        src_t = src * dts
        if dest_t >= src_t + dts or src == 0:
            src += 1
            src_t += dts
        fac = (dest_t - src_t) / dts
        expected = fac * (x[src] - x[src - 1])
        np.testing.assert_allclose(out[n], expected, rtol=1e-5, atol=1e-6)
    full = np.asarray(video.linear_interpolation(x, fps_s, fps_d, add_base=True))
    assert np.all(np.isfinite(full))


def test_phase_correlation_recovers_shift():
    rng = np.random.default_rng(2)
    base = ndi.gaussian_filter(rng.random((32, 32)).astype(np.float32), 1.5)
    shifted = np.roll(np.roll(base, 3, axis=0), -5, axis=1)
    _, (dy, dx) = video.phase_correlation(shifted, base)
    assert int(dy) == 3 and int(dx) == -5


def test_horn_schunck_recovers_translation():
    rng = np.random.default_rng(3)
    base = ndi.gaussian_filter(rng.random((48, 48)).astype(np.float32) * 100, 3.0)
    moved = np.roll(base, 1, axis=1)  # 1 px to the right
    u, v = video.horn_schunck_flow(base, moved, alpha=5.0, n_iter=200)
    inner = np.s_[8:-8, 8:-8]
    assert np.asarray(u)[inner].mean() > 0.4  # flow points +x
    assert abs(np.asarray(v)[inner].mean()) < 0.2


def test_pca_roundtrip():
    rng = np.random.default_rng(4)
    M, n, k = 20, 8, 5
    A = rng.standard_normal((M, M))
    evec, _ = np.linalg.qr(A)
    evec = evec[:, :n].astype(np.float32)
    mean = rng.standard_normal(M).astype(np.float32)
    coef_true = rng.standard_normal((3, k)).astype(np.float32)
    x = coef_true @ evec[:, -k:].T + mean
    coef = np.asarray(video.pca_feature(x, evec, mean, k))
    np.testing.assert_allclose(coef, coef_true, rtol=1e-4, atol=1e-4)
    recon = np.asarray(video.ipca_feature(coef, evec, mean))
    np.testing.assert_allclose(recon, x, rtol=1e-4, atol=1e-4)


def test_save_load_image(tmp_path, img):
    p = str(tmp_path / "x.pgm")
    video.save_image(p, img)
    back = video.load_image(p)
    np.testing.assert_allclose(back, np.clip(np.round(img), 0, 255))
    rgb = np.stack([img, img * 0.5, 255 - img], axis=-1)
    p3 = str(tmp_path / "x.ppm")
    video.save_image(p3, rgb)
    back3 = video.load_image(p3)
    assert back3.shape == rgb.shape
    np.testing.assert_allclose(back3, np.clip(np.round(rgb), 0, 255))


# ---------------------------------------------------------------------------
# AVI ingest (utils/avi.py — the VideoFeature file path, videofeature.cc:92-141)
# ---------------------------------------------------------------------------

def _rand_frames(rng, n=5, h=18, w=25):
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_uncompressed_roundtrip(tmp_path, rng):
    from distant_speech_recognition_tpu.utils import avi

    frames = _rand_frames(rng)
    p = str(tmp_path / "clip.avi")
    avi.write_avi(p, frames, fps=10.0)

    info = avi.avi_info(p)
    assert (info.width, info.height) == (25, 18)
    assert info.total_frames == 5
    assert info.compression == ""
    assert abs(info.fps - 10.0) < 1e-6
    # the reference's raw dwTotalFrames peek at byte 0x30
    # (VideoFeature::Frames, videofeature.cc:127-141)
    assert avi.avi_frame_count(p) == 5

    back = avi.read_avi(p)
    np.testing.assert_array_equal(back, frames)
    # frame-range window (read(filename, from, to), videofeature.cc:92-125)
    np.testing.assert_array_equal(avi.read_avi(p, 1, 4), frames[1:4])


def test_avi_feeds_video_feature_layout(tmp_path, rng):
    """Decoded AVI frames -> the reference's exact width-major gray vectors."""
    from distant_speech_recognition_tpu.utils import avi

    frames = _rand_frames(rng, n=3)
    p = str(tmp_path / "clip.avi")
    avi.write_avi(p, frames)
    feats = np.asarray(video.video_frames(avi.read_avi(p).astype(np.float32), mode=1))
    assert feats.shape == (3, 25 * 18)
    f = frames.astype(np.float64)
    gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    expect = np.swapaxes(gray, -1, -2).reshape(3, -1)
    np.testing.assert_allclose(feats, expect, rtol=1e-5, atol=1e-3)


def test_avi_mjpg_decodes(tmp_path, rng):
    """MJPG-compressed streams decode through Pillow."""
    import io
    import struct

    from PIL import Image

    from distant_speech_recognition_tpu.utils import avi

    # smooth frames so JPEG loss stays small
    yy, xx = np.mgrid[0:18, 0:25].astype(np.float32)
    frames = np.stack(
        [np.stack([yy * 5 + i * 10, xx * 5, yy + xx], -1) for i in range(3)]
    ).clip(0, 255).astype(np.uint8)

    jpegs = []
    for fr in frames:
        b = io.BytesIO()
        Image.fromarray(fr).save(b, "JPEG", quality=95)
        jpegs.append(b.getvalue())

    # hand-build an MJPG AVI with the module's own chunk helpers
    strf = struct.pack("<IiihhIIiiII", 40, 25, 18, 1, 24,
                       struct.unpack("<I", b"MJPG")[0], 0, 0, 0, 0, 0)
    strh = (b"vidsMJPG" + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, 25,
                                      0, len(jpegs), 0, 0, 0, 0, 0, 25, 18))
    strl = avi._list(b"strl", avi._chunk(b"strh", strh) + avi._chunk(b"strf", strf))
    avih = struct.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0x10, len(jpegs), 0, 1,
                       0, 25, 18, 0, 0, 0, 0)
    hdrl = avi._list(b"hdrl", avi._chunk(b"avih", avih) + strl)
    movi = avi._chunk(b"LIST", b"movi" + b"".join(avi._chunk(b"00dc", j) for j in jpegs))
    riff = b"AVI " + hdrl + movi
    p = str(tmp_path / "clip_mjpg.avi")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)

    info = avi.avi_info(p)
    assert info.compression.upper().startswith("MJPG")
    back = avi.read_avi(p)
    assert back.shape == frames.shape
    err = np.abs(back.astype(np.float64) - frames.astype(np.float64)).mean()
    assert err < 6.0, err  # JPEG quality-95 tolerance
