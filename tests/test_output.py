"""EXR/PNG output: self-roundtrip plus cross-validation against OpenCV's
independent EXR implementation."""

import os

import numpy as np
import pytest

from hijiki_tpu.utils.exr import read_exr, tonemap_srgb, write_exr, write_png


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 20, (37, 53, 3)).astype(np.float32)
    img[0, 0] = [0.0, -1.0, 1e-8]
    path = str(tmp_path / "t.exr")
    write_exr(path, img)
    np.testing.assert_array_equal(read_exr(path), img)


def test_exr_cross_validated_with_opencv(tmp_path):
    os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 5, (16, 24, 3)).astype(np.float32)
    path = str(tmp_path / "x.exr")
    write_exr(path, img)
    got = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if got is None:
        pytest.skip("OpenCV built without OpenEXR")
    np.testing.assert_array_equal(got[:, :, ::-1], img)  # cv2 loads BGR

    # and read one written by OpenCV
    path2 = str(tmp_path / "y.exr")
    ok = cv2.imwrite(
        path2, img[:, :, ::-1], [cv2.IMWRITE_EXR_COMPRESSION, cv2.IMWRITE_EXR_COMPRESSION_NO]
    )
    if not ok:
        pytest.skip("OpenCV EXR write unavailable")
    np.testing.assert_array_equal(read_exr(path2), img)


def test_png_and_tonemap(tmp_path):
    img = np.array([[[0.0, 0.5, 1.0], [2.0, np.nan, -1.0]]], np.float32)
    tm = tonemap_srgb(img)
    assert tm.min() >= 0 and tm.max() <= 1
    assert not np.any(np.isnan(tm))
    path = str(tmp_path / "p.png")
    write_png(path, np.tile(img, (4, 2, 1)))
    from PIL import Image

    assert Image.open(path).size == (4, 4)


def test_terminal_preview_ansi():
    """Live terminal preview: half-block ANSI frames, in-place redraws,
    disabled cleanly off-tty (utils/term_preview.py — the winit live-view
    analog for headless hosts)."""
    import io

    import numpy as np

    from hijiki_tpu.utils.term_preview import TerminalPreview, render_ansi

    img = np.zeros((32, 48, 3), np.float32)
    img[:16] = [1.0, 0.0, 0.0]
    s = render_ansi(img, max_cols=24, max_rows=8)
    assert "▀" in s and "\x1b[38;2;255;0;0m" in s
    assert s.count("\n") + 1 <= 8

    buf = io.StringIO()
    tp = TerminalPreview(stream=buf, enabled=True)
    tp.update(img, status="1/2 sweeps")
    first = buf.getvalue()
    assert "1/2 sweeps" in first and "▀" in first
    tp.update(img, status="2/2 sweeps")
    # second frame rewinds the cursor instead of appending a new image
    assert "\x1b[" + str(first.count("\n")) + "F" in buf.getvalue()

    off = TerminalPreview(stream=io.StringIO(), enabled=False)
    off.update(img)  # no-op
