"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import engine, parallel
from lintransunet_tpu.losses import binary as bin_losses
from lintransunet_tpu.models import MaskTransUnet

TINY = dict(
    num_layers=(8, 16, 32),
    roi_size_list=(8, 6, 4),
    is_roi_list=(False, True, True),
    dim_input=1,
    dim_output=2,
)


def test_mesh_has_8_devices():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_matches_single_device(rng):
    """The sharded step must produce the same params as the unsharded one."""
    model = MaskTransUnet(**TINY)
    x0 = jnp.zeros((8, 16, 16, 4, 1), jnp.float32)
    state = engine.create_train_state(model, jax.random.PRNGKey(0), x0,
                                      learning_rate=1e-3)
    criterions = [bin_losses.get_criterions(["CrossEntroLoss", "DiceClassLoss"])
                  for _ in range(3)]

    images = rng.standard_normal((8, 16, 16, 4, 1)).astype(np.float32)
    labels = (rng.random((8, 16, 16, 4)) > 0.8).astype(np.int32)
    dyn_w = jnp.ones((3,), jnp.float32)
    key = jax.random.PRNGKey(7)

    step_plain = engine.make_train_step(model, criterions, donate=False)
    s1, loss1, _ = step_plain(state, jnp.asarray(images), jnp.asarray(labels),
                              dyn_w, key)

    mesh = parallel.make_mesh()

    def raw_step(state, images, labels, dyn_w, rng):
        def loss_fn(params):
            out, masks = model.apply({"params": params}, images, train=True,
                                     rngs={"dropout": rng})
            return engine.deep_supervision_loss(out, masks, labels,
                                                criterions, dyn_w)
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads=grads), loss, logs

    step_dp = parallel.data_parallel_jit(raw_step, mesh, batch_argnums=(1, 2))
    imgs_sharded = parallel.shard_batch(mesh, jnp.asarray(images))
    lbls_sharded = parallel.shard_batch(mesh, jnp.asarray(labels))
    s2, loss2, _ = step_dp(state, imgs_sharded, lbls_sharded, dyn_w, key)

    # Dropout RNG is positionally identical (same key, same global shapes),
    # so losses and updated params must agree to numerical tolerance.
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # AdamW normalises the update, so cross-device reduction-order noise on
    # near-zero grads shows up at ~1e-5; compare against the 1e-3 update scale.
    a = np.asarray(jax.tree.leaves(s1.params)[0])
    b = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_dp_sliding_window_batch(rng):
    """Batch-sharded sliding-window inference over the mesh (BASELINE config 5)."""
    mesh = parallel.make_mesh()
    vol = rng.standard_normal((8, 8, 8, 10, 1)).astype(np.float32)

    def run(volume):
        return engine.sliding_window_inference(
            volume, (8, 8, 4), 2, lambda x: jnp.concatenate([x, -x], -1),
            overlap=0.6)

    run_dp = parallel.data_parallel_jit(run, mesh, batch_argnums=(0,))
    out = run_dp(parallel.shard_batch(mesh, jnp.asarray(vol)))
    assert out.shape == (8, 8, 8, 10, 2)
    np.testing.assert_allclose(np.asarray(out)[..., 0], vol[..., 0], atol=1e-5)
