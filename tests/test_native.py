"""Native C++ preprocessing core vs numpy reference."""

import numpy as np
import pytest

from lintransunet_tpu import native


@pytest.mark.skipif(not native.AVAILABLE, reason="native lib not built")
def test_hu_window_matches_numpy(rng):
    img = rng.normal(40, 80, (24, 64, 64)).astype(np.float32)
    got = native.hu_window_normalize(img, -91, 250, 86.9, 39.4)
    ref = ((np.clip(img, -91, 250) - 86.9) / 39.4).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.skipif(not native.AVAILABLE, reason="native lib not built")
def test_crop3d_matches_slicing(rng):
    vol = rng.normal(size=(30, 40, 20)).astype(np.float32)
    got = native.crop3d(vol, (3, 5, 2), (16, 24, 12))
    np.testing.assert_array_equal(got, vol[3:19, 5:29, 2:14])
    lbl = (vol > 0).astype(np.uint8)
    got_u = native.crop3d(lbl, (0, 0, 0), (8, 8, 8))
    np.testing.assert_array_equal(got_u, lbl[:8, :8, :8])


@pytest.mark.skipif(not native.AVAILABLE, reason="native lib not built")
def test_sample_crop_centers_bias_and_bounds(rng):
    lbl = np.zeros((40, 40, 16), np.uint8)
    lbl[10:14, 10:14, 4:8] = 1
    c = native.sample_crop_centers(lbl, (16, 16, 8), 0.7, 0.3, 200, seed=3)
    assert c.shape == (200, 3)
    assert (c >= 0).all()
    assert (c[:, 0] <= 24).all() and (c[:, 2] <= 8).all()
    # most crops must contain the foreground blob (pos=0.7)
    contains = np.mean((c[:, 0] <= 13) & (c[:, 0] + 16 > 10)
                       & (c[:, 1] <= 13) & (c[:, 1] + 16 > 10))
    assert contains > 0.5
