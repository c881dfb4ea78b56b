"""Native data-loader core: build, decode parity vs cv2, boundary-mask
parity vs the numpy/cv2 reference implementation."""

import os

import numpy as np
import pytest

cv = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def lib():
    from animatablegaussians_tpu.native import load_native
    lib = load_native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    base = (rng.random((64, 48, 3)) * 255).astype(np.uint8)
    # smooth the image so JPEG decode differences stay tiny
    base = cv.GaussianBlur(base, (7, 7), 3)
    for i in range(4):
        p = str(d / f"img_{i}.jpg")
        cv.imwrite(p, np.roll(base, i, axis=0),
                   [cv.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_decode_jpeg_matches_cv2(lib, jpgs):
    from animatablegaussians_tpu.data import native_io
    got = native_io.decode_jpeg(jpgs[0])
    want = cv.imread(jpgs[0], cv.IMREAD_COLOR)
    assert got.shape == want.shape
    # same JPEG, two decoders: allow small IDCT rounding differences
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0

    g_gray = native_io.decode_jpeg(jpgs[0], grayscale=True)
    assert g_gray.shape == want.shape[:2]


def test_decode_jpeg_batch(lib, jpgs):
    from animatablegaussians_tpu.data import native_io
    out = native_io.decode_jpeg_batch(jpgs, n_threads=4)
    assert out.shape[0] == len(jpgs)
    for i, p in enumerate(jpgs):
        want = cv.imread(p, cv.IMREAD_COLOR)
        assert np.mean(np.abs(out[i].astype(int) - want.astype(int))) < 2.0


def test_boundary_mask_matches_reference_impl(lib):
    from animatablegaussians_tpu.data import native_io
    from animatablegaussians_tpu.data.mv_rgb_dataset import MvRgbDatasetBase

    rng = np.random.default_rng(1)
    raw = np.zeros((40, 50), np.uint8)
    raw[10:30, 15:35] = 255
    raw[20:22, 34:38] = 100       # soft matte pixels
    raw += (rng.random(raw.shape) * 4).astype(np.uint8)  # sub-threshold noise

    b_ref, m_ref = MvRgbDatasetBase.get_boundary_mask(raw.copy())
    b_nat, m_nat = native_io.boundary_mask(raw.copy())
    np.testing.assert_array_equal(m_nat, m_ref)
    np.testing.assert_array_equal(b_nat, b_ref)
