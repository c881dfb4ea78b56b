"""EXR codec round trips across compressions, dtypes and channel layouts."""

import numpy as np
import pytest

from animatablegaussians_tpu.utils import exr


@pytest.mark.parametrize("shape,half,comp", [
    ((33, 47, 3), False, exr.ZIP),
    ((16, 16), False, exr.ZIPS),
    ((20, 20, 4), True, exr.ZIP),
    ((7, 130, 3), False, exr.NO_COMPRESSION),
    ((512, 1024, 3), False, exr.ZIP),     # pose-map scale
])
def test_roundtrip(tmp_path, shape, half, comp):
    rng = np.random.default_rng(0)
    a = rng.standard_normal(shape).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, a, half=half, compression=comp)
    b = exr.read_exr(p)
    assert b.shape == (a.shape if a.ndim == 3 else a.shape)
    if half:
        np.testing.assert_allclose(a.reshape(b.shape), b, atol=2e-3,
                                   rtol=2e-3)
    else:
        np.testing.assert_array_equal(a.reshape(b.shape), b)


def test_incompressible_block_fallback(tmp_path):
    # random uint-ish noise may be incompressible -> raw-block fallback
    rng = np.random.default_rng(1)
    a = rng.standard_normal((17, 19, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write_exr(p, a, compression=exr.ZIP)
    np.testing.assert_array_equal(exr.read_exr(p), a)


def test_bad_magic(tmp_path):
    p = str(tmp_path / "bad.exr")
    open(p, "wb").write(b"notanexr")
    with pytest.raises(ValueError):
        exr.read_exr(p)
