"""Aux subsystem tests: gaussian blending, NaN guards, timing helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import engine
from lintransunet_tpu.utils import finite_check, nan_guard, timed


def test_gaussian_blending_reconstructs_identity(rng):
    # identity predictor: any importance profile must still reconstruct the
    # input exactly (the normalisation map divides out the blend weights)
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 12, 2)).astype(np.float32))
    out = engine.sliding_window_inference(
        vol, (8, 8, 4), 1, lambda x: x, overlap=0.6, mode="gaussian",
        sigma_scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-4)


def test_gaussian_runner(rng):
    runner = engine.SlidingWindowRunner(lambda x: x, (8, 8, 4), 1,
                                        mode="gaussian", sigma_scale=0.25,
                                        depth_bucket=4)
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 7, 1)).astype(np.float32))
    out = runner(vol)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-4)


def test_gaussian_importance_profile():
    from lintransunet_tpu.engine.sliding_window import gaussian_importance

    imp = gaussian_importance((9, 9, 5), 0.125)
    assert imp.shape == (9, 9, 5)
    assert imp[4, 4, 2] == imp.max()  # centre-peaked
    assert imp.min() > 0  # clipped away from zero (MONAI semantics)


def test_finite_check_and_nan_guard():
    good = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    assert finite_check(good)
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    assert not finite_check(bad)
    # nan_guard is identity and jit-safe
    x = jnp.ones((4,))
    y = jax.jit(lambda v: nan_guard(v, "x") * 2)(x)
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_timed_forces_sync():
    f = jax.jit(lambda x: x * 2)
    secs, result = timed(f, jnp.ones((8, 8)), warmup=1, iters=2)
    assert secs > 0
    np.testing.assert_allclose(np.asarray(result), 2.0)
