"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu import engine, parallel
from lintransunet_tpu.losses import binary as bin_losses
from lintransunet_tpu.models import MaskTransUnet
import pytest

TINY = dict(
    num_layers=(8, 32),
    roi_size_list=(6, 4),
    is_roi_list=(False, True),
    dim_input=1,
    dim_output=2,
    n_layers=1,  # single-layer bridges: CPU-mesh compile time, same SPMD shape
)


def test_mesh_has_8_devices():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_dp_train_step_matches_single_device(rng):
    """The sharded step must produce the same params as the unsharded one."""
    model = MaskTransUnet(**TINY)
    x0 = jnp.zeros((8, 16, 16, 4, 1), jnp.float32)
    state = engine.create_train_state(model, jax.random.PRNGKey(0), x0,
                                      learning_rate=1e-3)
    criterions = [bin_losses.get_criterions(["CrossEntroLoss", "DiceClassLoss"])
                  for _ in range(2)]

    images = rng.standard_normal((8, 16, 16, 4, 1)).astype(np.float32)
    labels = (rng.random((8, 16, 16, 4)) > 0.8).astype(np.int32)
    dyn_w = jnp.ones((2,), jnp.float32)
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


@pytest.mark.slow
def test_train_cli_runs_data_parallel(tmp_path):
    """cli/train3d.main must execute its SPMD path on the 8-device mesh
    (batch sharded over the data axis) — the CLI equivalent of the
    reference's nn.DataParallel wrap (train3D.py:119)."""
    import os
    import types

    from lintransunet_tpu.cli import train3d
    from lintransunet_tpu.data.split import write_split_json

    data = tmp_path / "data"
    os.makedirs(data / "image")
    os.makedirs(data / "label")
    rng = np.random.default_rng(3)
    for i in range(4):
        img = rng.normal(40.0, 60.0, (8, 16, 16)).astype(np.float32)
        lbl = np.zeros((8, 16, 16), np.uint8)
        lbl[2:5, 4:10, 5:11] = 1
        np.save(data / "image" / f"{i:04d}.npy", img)
        np.save(data / "label" / f"{i:04d}.npy", lbl)
    split = str(tmp_path / "split.json")
    write_split_json(4, split, n_splits=2, seed=0)

    args = types.SimpleNamespace(
        dir_data=str(data), is_transform=False, split_ratio=0.9,
        is_pretrained=False, pretrained_dir="", batch_size=1, depth_size=8,
        num_samples=2, device="cpu", epochs=1, eval_epoch=5,
        log_dir=str(tmp_path / "runs"), model_dir=str(tmp_path / "out"),
        criterion_list=("CrossEntroLoss", "DiceClassLoss"),
        criterion_weight=(1.0, 1.0),
        weight_list=(0.1, 1.0), final_weight=(2.0, 1.0),
        initial_weight=(0.1, 1.0), fold_num=0, split_json=split,
        learning_rate=1e-3, plateau_factor=0.8, plateau_patience=5,
        plateau_threshold=1e-2, plateau_cooldown=1, min_lr=1e-7,
        warmup_step=1, weight_T=12.0, num_classes=2, seed=0,
        model_name="MaskTransUnet", num_layers=(8, 32),
        roi_size_list=(6, 4), is_roi_list=(False, True),
        dim_input=1, dim_output=2, kernel_size=3, compute_dtype="float32",
        image_crop=16, attn_layers=1,
    )
    assert jax.device_count() == 8  # batch_size becomes 8, sharded 1/chip
    train3d.main(args)
    out_root = str(tmp_path / "out")
    run = os.listdir(out_root)[0]
    assert os.path.isdir(os.path.join(out_root, run, "fold_0", "train_state"))


def test_runner_batch_sharded_matches_single(rng):
    """run_batch over the mesh == per-volume runner outputs (config 5)."""
    mesh = parallel.make_mesh()

    def predictor(x):
        return jnp.concatenate([x * 2.0, -x], axis=-1)

    runner = engine.SlidingWindowRunner(predictor, (8, 8, 4), 2,
                                        overlap=0.6, depth_bucket=4)
    vols = [jnp.asarray(rng.standard_normal((1, 8, 8, 3 + i, 1))
                        .astype(np.float32)) for i in range(8)]
    sharded = runner.run_batch(vols, mesh=mesh)
    for v, o in zip(vols, sharded):
        ref = runner(v)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_dp_eval_forward_paired_matches_single_device(rng):
    """The paired (8C) layout's fold_pairs reshapes ride the sharded batch
    dim; the sharded eval forward must equal the single-device one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = MaskTransUnet(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
                          is_roi_list=(False, True, True), dim_input=1,
                          dim_output=2, n_layers=1, packed_levels=2,
                          folded=True, paired=True)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 4, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = engine.make_eval_forward(model)
    ref = jax.jit(fwd)(variables["params"], x)

    mesh = parallel.make_mesh()
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())
    fwd_dp = jax.jit(fwd, in_shardings=(repl, shard))
    got = fwd_dp(variables["params"], jax.device_put(x, shard))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
