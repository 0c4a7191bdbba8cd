"""Exactness of the Pallas packed stride-1 conv (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lintransunet_tpu.ops import packed_conv as pc
from lintransunet_tpu.ops.pallas_conv import packed_conv3d_stride1_pallas


@pytest.mark.parametrize("c,o,shape,th,tw", [
    (4, 4, (16, 16, 8), 8, 8),
    (8, 4, (16, 8, 8), 8, 8),
    (4, 8, (8, 24, 16), 8, 8),
])
def test_pallas_packed_conv_matches_xla(rng, c, o, shape, th, tw):
    h2, w2, d = shape
    x = jnp.asarray(rng.standard_normal((2, h2, w2, d, 4 * c))
                    .astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
                       * 0.1)
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_stride1_jnp(kern)
    bp = pc.pack_bias_jnp(bias)

    ref = pc.packed_conv3d_stride1(x, kp, bp)
    got = packed_conv3d_stride1_pallas(x, kp, bp, th=th, tw=tw,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_packed_conv_rejects_untileable(rng):
    x = jnp.zeros((1, 12, 16, 8, 16), jnp.float32)
    kp = jnp.zeros((3, 3, 3, 16, 16), jnp.float32)
    with pytest.raises(ValueError):
        packed_conv3d_stride1_pallas(x, kp, th=8, tw=8)
