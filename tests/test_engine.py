"""Engine tests: train step, label pyramid, sliding window, checkpoint, LR."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lintransunet_tpu import engine
from lintransunet_tpu.losses import binary as bin_losses
from lintransunet_tpu.models import MaskTransUnet

# 3-level model: engine mechanics don't need the full 5-level geometry and
# CPU compiles of the 5-level ROI decoder dominate test wall-clock.
SMALL = dict(
    num_layers=(8, 16, 32),
    roi_size_list=(8, 6, 4),
    is_roi_list=(False, True, True),
    dim_input=1,
    dim_output=2,
)


def _criterion_stack():
    # get_criterion_list shape (train3D.py:139-155): CE+BalanceDice low
    # levels, CE+DiceClass for the top two (3-level variant here).
    lows = [bin_losses.get_criterions(["CrossEntroLoss", "BalanceDiceLoss"])]
    mid = bin_losses.get_criterions(["CrossEntroLoss", "DiceClassLoss"])
    top = bin_losses.get_criterions(["CrossEntroLoss", "DiceClassLoss"])
    return lows + [mid, top]


@pytest.fixture(scope="module")
def model_and_state():
    model = MaskTransUnet(**SMALL)
    x = jnp.zeros((2, 16, 16, 4, 1), jnp.float32)
    state = engine.create_train_state(
        model, jax.random.PRNGKey(0), x, learning_rate=1e-3, step_times=2)
    # ONE jitted step shared by every test below — rebuilding it per test
    # forces a fresh compile of the identical program (tens of seconds on
    # the CPU runner).
    step = engine.make_train_step(model, _criterion_stack(), donate=False)
    return model, state, step


@pytest.mark.slow
def test_train_step_descends(model_and_state, rng):
    model, state, step = model_and_state
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 1)).astype(np.float32))
    labels = jnp.asarray((rng.random((2, 16, 16, 4)) > 0.8).astype(np.int32))
    dyn_w = jnp.asarray([0.1, 0.1, 1.0], jnp.float32)

    losses = []
    for i in range(6):
        state, loss, logs = step(state, images, labels, dyn_w,
                                 jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0], losses
    assert any("DiceClassLoss layer2" in k for k in logs)


def test_dynamic_weight_changes_no_recompile(model_and_state, rng):
    model, state, step = model_and_state
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 1)).astype(np.float32))
    labels = jnp.zeros((2, 16, 16, 4), jnp.int32)
    w1 = jnp.asarray([0.1, 0.1, 1.0], jnp.float32)
    w2 = jnp.asarray([0.3, 0.4, 1.0], jnp.float32)
    _, l1, _ = step(state, images, labels, w1, jax.random.PRNGKey(0))
    size_after_first = step._cache_size()
    _, l2, _ = step(state, images, labels, w2, jax.random.PRNGKey(0))
    # different weight VALUES reuse the compiled program (weights are traced
    # operands, not literals)
    assert step._cache_size() == size_after_first
    assert float(l1) != float(l2)


def test_grad_accumulation_every_k(model_and_state, rng):
    model, state, step = model_and_state
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 1)).astype(np.float32))
    labels = jnp.zeros((2, 16, 16, 4), jnp.int32)
    dyn_w = jnp.ones((3,), jnp.float32)
    p0 = jax.tree.leaves(state.params)[0]
    state1, _, _ = step(state, images, labels, dyn_w, jax.random.PRNGKey(0))
    # after 1 of 2 micro-steps params must be unchanged (accumulating)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state1.params)[0]), np.asarray(p0))
    state2, _, _ = step(state1, images, labels, dyn_w, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(jax.tree.leaves(state2.params)[0]) -
                  np.asarray(p0)).max() > 0


def test_label_pyramid_matches_reference_schedule(rng):
    """The pooled-label pyramid must land on the decoder's mask resolutions
    (5-level geometry, utils_3D_embed_full.py:64,73-76)."""
    labels = jnp.asarray((rng.random((1, 64, 64, 8)) > 0.5).astype(np.int32))
    shapes = []
    temp = engine.train.max_pool3d(
        labels.astype(jnp.float32)[..., None], (2, 2, 1), (2, 2, 1))
    for k in range(1, 5):
        shapes.append(temp.shape[1:4])
        if k < 4:
            kern = engine.train.label_pyramid_kernel(k)
            temp = engine.train.max_pool3d(temp, kern, kern)
    # mask_list is coarse->fine: [-1]=finest; compare reversed
    assert shapes == [(32, 32, 8), (16, 16, 8), (8, 8, 4), (4, 4, 4)]


def test_sliding_window_equals_direct_when_single_window(rng):
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 4, 1)).astype(np.float32))
    predictor = lambda x: jnp.concatenate([x * 2, x * -1], axis=-1)
    out = engine.sliding_window_inference(vol, (8, 8, 4), 2, predictor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(predictor(vol)),
                               rtol=1e-6)


def test_sliding_window_overlap_blending(rng):
    # identity predictor: blended overlapping windows must reconstruct input
    vol = jnp.asarray(rng.standard_normal((2, 8, 8, 10, 3)).astype(np.float32))
    out = engine.sliding_window_inference(
        vol, (8, 8, 4), 2, lambda x: x, overlap=0.6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_sliding_window_grid_matches_monai_semantics():
    # overlap 0.6, roi 64, dim 100: interval=int(64*0.4)=25,
    # count=ceil(36/25)+1=3, last clipped to 36
    assert engine.sliding_window.window_starts_1d(100, 64, 25) == [0, 25, 36]
    assert engine.sliding_window.scan_interval((100,), (64,), 0.6) == (25,)
    assert engine.sliding_window.scan_interval((64,), (64,), 0.6) == (0,)


def test_sliding_window_pads_small_volumes(rng):
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 3, 1)).astype(np.float32))
    out = engine.sliding_window_inference(vol, (8, 8, 4), 1, lambda x: x)
    assert out.shape == (1, 8, 8, 3, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-6)


def test_runner_depth_bucketing(rng, monkeypatch):
    # chunk_bucket=4 rounds the chunk counts of both depths (2 and 4 real
    # windows after the sw re-chunk) to a common value (the default is 1:
    # exact grids, no pad-window forwards). Under the default SW_E2E the
    # pad/crop live inside the program so each real depth compiles its own
    # (one dispatch per volume); with E2E off the bucket consolidates both
    # depths onto ONE compiled program (fewer programs, two extra
    # dispatches) — both paths must be exact.
    for e2e, want_programs in ((True, 2), (False, 1)):
        monkeypatch.setattr(engine.sliding_window, "SW_E2E", e2e)
        runner = engine.SlidingWindowRunner(lambda x: x, (8, 8, 4), 2,
                                            depth_bucket=4, chunk_bucket=4)
        for d in (5, 7):
            vol = jnp.asarray(
                rng.standard_normal((1, 8, 8, d, 2)).astype(np.float32))
            out = runner(vol)
            assert out.shape == vol.shape
            np.testing.assert_allclose(np.asarray(out), np.asarray(vol),
                                       atol=1e-6)
        assert len(runner._programs) == want_programs, (e2e, runner._programs)


def test_checkpoint_roundtrip(tmp_path, model_and_state):
    model, state, _ = model_and_state
    path = str(tmp_path / "ckpt")
    engine.save_checkpoint(path, {"params": state.params, "step": 3})
    restored = engine.restore_checkpoint(path)
    got = restored["state"]["params"]
    ref_leaves = jax.tree.leaves(state.params)
    got_leaves = jax.tree.leaves(got)
    assert len(ref_leaves) == len(got_leaves)
    np.testing.assert_allclose(np.asarray(got_leaves[0]),
                               np.asarray(ref_leaves[0]))


def test_plateau_scheduler_matches_torch():
    import torch

    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(lin.parameters(), lr=1e-4)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.8, patience=5, threshold=1e-2, cooldown=1,
        min_lr=1e-7)
    ours = engine.ReduceLROnPlateau(lr=1e-4, factor=0.8, patience=5,
                                    threshold=1e-2, cooldown=1, min_lr=1e-7)
    rng = np.random.default_rng(0)
    metrics = list(rng.random(40) * 2) + [1.5] * 20
    for m in metrics:
        sch.step(m)
        ours.step(m)
        assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6), m


def test_set_learning_rate(model_and_state):
    _, state, _ = model_and_state
    state = engine.set_learning_rate(state, 5e-5)
    assert engine.get_learning_rate(state) == pytest.approx(5e-5)


def test_weight_schedule_matches_reference():
    # get_weight (utils_3D_embed_full.py:16-19)
    for t in (-3, 0, 5, 100):
        ref = min(0.1 + 0.05 * np.exp(max(t, 0) / (5 * 12)), 2.0)
        assert engine.get_weight(t, 12, 0.05, 0.1, 2.0) == pytest.approx(ref)
    table = engine.get_dynamic_weight(
        epochs=20, T=12, warmup_step=10,
        weight_list=[0.05, 1.0], initial_weight=[0.1, 1.0],
        final_weight=[2.0, 1.0])
    assert len(table) == 20 and len(table[0]) == 2
    assert table[0][0] == table[10][0]  # warmup holds t=0
    assert table[19][0] > table[10][0]


def test_runner_depth_bucketing_matches_unbucketed(rng):
    """Bucket padding must not leak zero context into real-depth voxels.

    D=14 with roi depth 8 and depth_bucket 8: the runner pads to 16, but the
    window grid/blend must be that of the real 14-deep volume (MONAI pads
    only to roi) — windows start at {0, 6}, never inside the pad.
    """
    vol = rng.standard_normal((1, 8, 8, 14, 1)).astype(np.float32)

    def predictor(x):
        return jnp.concatenate([x, 2.0 * x], axis=-1)

    direct = engine.sliding_window_inference(
        jnp.asarray(vol), (8, 8, 8), 2, predictor, overlap=0.25)
    runner = engine.SlidingWindowRunner(
        predictor, (8, 8, 8), 2, overlap=0.25, depth_bucket=8)
    bucketed = runner(jnp.asarray(vol))
    assert bucketed.shape == direct.shape
    np.testing.assert_allclose(np.asarray(bucketed), np.asarray(direct),
                               atol=1e-6)


def test_runner_shares_programs_across_depth_bucket(rng, monkeypatch):
    # E2E=0: the bucket consolidates all three depths onto one program
    # (the many-distinct-depths serving configuration; the default E2E=1
    # trades this for one dispatch per volume — test_runner_depth_bucketing
    # covers both).
    monkeypatch.setattr(engine.sliding_window, "SW_E2E", False)
    predictor = lambda x: x
    runner = engine.SlidingWindowRunner(
        predictor, (8, 8, 8), 1, overlap=0.25, depth_bucket=8, chunk_bucket=4)
    for d in (9, 11, 14):
        vol = rng.standard_normal((1, 8, 8, d, 1)).astype(np.float32)
        out = runner(jnp.asarray(vol))
        assert out.shape == (1, 8, 8, d, 1)
        np.testing.assert_allclose(np.asarray(out)[..., 0], vol[..., 0],
                                   atol=1e-5)
    assert len(runner._programs) == 1  # one bucket -> one compiled program


def test_full_train_state_resume(tmp_path, model_and_state):
    """params + opt_state + step + host schedule state all survive resume."""
    model, state, _ = model_and_state
    state = state.replace(step=7)
    state = engine.set_learning_rate(state, 5e-4)
    sched = engine.ReduceLROnPlateau(lr=5e-4, factor=0.5, patience=2)
    sched.step(1.0)
    sched.step(2.0)  # one bad epoch

    path = str(tmp_path / "train_state")
    engine.save_train_state(path, state, aux={
        "epoch": 3, "best_eval_loss": 1.0, "global_step": 11,
        "scheduler": sched.state_dict()})

    fresh = engine.create_train_state(
        model, jax.random.PRNGKey(9), jnp.zeros((2, 16, 16, 4, 1)),
        learning_rate=1e-3, step_times=2)
    got, aux = engine.restore_train_state(path, fresh)

    assert int(got.step) == 7
    np.testing.assert_allclose(engine.get_learning_rate(got), 5e-4, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(got.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert aux["epoch"] == 3 and aux["global_step"] == 11
    restored_sched = engine.ReduceLROnPlateau(**aux["scheduler"])
    assert restored_sched.num_bad_epochs == sched.num_bad_epochs
    assert restored_sched.best == sched.best


def test_scan_split_bit_identical(rng, monkeypatch):
    """SCAN_SPLIT (two-scan forward/blend decomposition) must be
    bit-identical to the fused scan: same slices, same blend math, the
    f32 upcast just moves across the stacked buffer. Covers sw_batch>1
    with a pad window (weight 0) and gaussian importance."""
    vol = jnp.asarray(rng.standard_normal((2, 8, 8, 10, 3)).astype(np.float32))
    predictor = lambda x: jnp.concatenate([x * 2.0, x[..., :1] - 1.0], axis=-1)
    for mode, sigma in (("constant", 0.0), ("gaussian", 0.125)):
        kw = dict(roi_size=(8, 8, 4), sw_batch_size=2, predictor=predictor,
                  overlap=0.6, mode=mode, sigma_scale=sigma)
        monkeypatch.setattr(engine.sliding_window, "SCAN_SPLIT", False)
        ref = np.asarray(engine.sliding_window_inference(vol, **kw))
        monkeypatch.setattr(engine.sliding_window, "SCAN_SPLIT", True)
        got = np.asarray(engine.sliding_window_inference(vol, **kw))
        np.testing.assert_array_equal(got, ref)

def test_sw_exec_split_matches_batch(rng, monkeypatch):
    """The runner's SW_EXEC=split re-chunk (each window through its own
    predictor call at sw=1) must be bit-identical to SW_EXEC=batch (the
    concatenated (sw*N)-batch execution) for a batch-equivariant
    predictor, and its grid must carry ZERO pad windows — the raw
    sliding_window_inference always honours the requested sw_batch."""
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 10, 3)).astype(np.float32))
    predictor = lambda x: jnp.concatenate([x * 2.0, x[..., :1] - 1.0], axis=-1)
    kw = dict(roi_size=(8, 8, 4), sw_batch_size=2, overlap=0.6)
    monkeypatch.setattr(engine.sliding_window, "SW_EXEC", "batch")
    ref_runner = engine.SlidingWindowRunner(predictor, **kw)
    ref = np.asarray(ref_runner(vol))
    monkeypatch.setattr(engine.sliding_window, "SW_EXEC", "split")
    runner = engine.SlidingWindowRunner(predictor, **kw)
    got = np.asarray(runner(vol))
    np.testing.assert_array_equal(got, ref)
    # 8x8x10 / roi 8x8x4 at overlap 0.6 -> interval 1 -> 7 depth starts;
    # split must run exactly 7 forwards (batch mode pads 7 windows to 4
    # chunks of 2, paying an 8th)
    starts, weights, _ = runner._grid(vol.shape)
    assert starts.shape == (7, 1, 3)
    assert float(np.asarray(weights).min()) == 1.0
    ref_starts, ref_weights, _ = ref_runner._grid(vol.shape)
    assert ref_starts.shape == (4, 2, 3)
    assert float(np.asarray(ref_weights).sum()) == 7.0


def test_scan_split_size_fallback(rng, monkeypatch):
    """Above SPLIT_MAX_BYTES the engine falls back to the fused scan —
    same output, bounded memory (the stacked-prediction buffer grows
    linearly with window count)."""
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 10, 3)).astype(np.float32))
    kw = dict(roi_size=(8, 8, 4), sw_batch_size=1, predictor=lambda x: x,
              overlap=0.6)
    ref = np.asarray(engine.sliding_window_inference(vol, **kw))
    monkeypatch.setattr(engine.sliding_window, "SPLIT_MAX_BYTES", 1)
    got = np.asarray(engine.sliding_window_inference(vol, **kw))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_model_batch_equivariance(rng):
    """The eval forward at batch 2 equals the two batch-1 forwards stacked
    (InstanceNorm/attention/bbox are all per-sample) — the property the
    SW_EXEC=split execution mode rests on."""
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(
        num_layers=(8, 32), roi_size_list=(6, 4), is_roi_list=(False, True),
        dim_input=1, dim_output=2, n_layers=1, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    both = np.asarray(fwd(variables, x))
    singles = np.concatenate(
        [np.asarray(fwd(variables, x[i:i + 1])) for i in range(2)], axis=0)
    np.testing.assert_allclose(both, singles, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_fg_only_eval_and_derive_background(rng):
    """The fg-only eval path + runner derive_background must reproduce the
    full 2-channel sliding-window output EXACTLY: the one-hot satisfies
    ch0 == 1 - ch1 and the identity survives any weighted blend
    (sum(w*(1-p))/sum(w) == 1 - sum(w*p)/sum(w))."""
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(
        num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
        is_roi_list=(False, True, True), dim_input=1, dim_output=2,
        n_layers=1, packed_levels=2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    full_fwd = engine.make_eval_forward(model, fg_only=False)
    fg_fwd = engine.make_eval_forward(model, fg_only=True)
    assert not full_fwd.fg_only and fg_fwd.fg_only

    # forward-level: fg == class-1 channel of the full one-hot
    full = np.asarray(full_fwd(variables["params"], x))
    fg = np.asarray(fg_fwd(variables["params"], x))
    assert fg.shape == full.shape[:-1] + (1,)
    np.testing.assert_array_equal(fg[..., 0], full[..., 1])

    # runner-level: blended outputs identical through overlap weighting
    vol = jnp.asarray(rng.standard_normal((1, 16, 16, 10, 1)
                                          ).astype(np.float32))
    kw = dict(roi_size=(16, 16, 4), sw_batch_size=1, overlap=0.6,
              mode="constant", depth_bucket=2)
    ref_runner = engine.SlidingWindowRunner(
        lambda b, p: full_fwd(p, b), **kw)
    fg_runner = engine.SlidingWindowRunner(
        lambda b, p: fg_fwd(p, b), derive_background=True, **kw)
    ref = np.asarray(ref_runner(vol, variables["params"]))
    got = np.asarray(fg_runner(vol, variables["params"]))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_static_depth_blend_matches_operand_path(rng, monkeypatch):
    """STATIC_BLEND (depth-region sums with static counts) must be
    bit-identical to the operand-path canvas/norm blend, engage only on
    the single-H/W-window constant-mode geometry, and fall back cleanly
    otherwise."""
    predictor = lambda x: jnp.concatenate([x * 2.0, x[..., :1] - 1.0],
                                          axis=-1)
    kw = dict(roi_size=(8, 8, 4), sw_batch_size=1, overlap=0.6)

    monkeypatch.setattr(engine.sliding_window, "STATIC_BLEND", False)
    for d in (10, 3):  # overlapping grid; sub-roi pad path
        vol = jnp.asarray(
            rng.standard_normal((2, 8, 8, d, 3)).astype(np.float32))
        ref = np.asarray(engine.SlidingWindowRunner(predictor, **kw)(vol))
        monkeypatch.setattr(engine.sliding_window, "STATIC_BLEND", True)
        runner = engine.SlidingWindowRunner(predictor, **kw)
        got = np.asarray(runner(vol))
        np.testing.assert_array_equal(got, ref)
        monkeypatch.setattr(engine.sliding_window, "STATIC_BLEND", False)

    # H wider than the roi -> multi-window H grid -> operand path
    monkeypatch.setattr(engine.sliding_window, "STATIC_BLEND", True)
    vol = jnp.asarray(rng.standard_normal((1, 12, 8, 6, 3)).astype(np.float32))
    runner = engine.SlidingWindowRunner(predictor, **kw)
    out = runner(vol)
    assert out.shape == (1, 12, 8, 6, 4)
    (fn, wants_grid), = runner._programs.values()
    assert wants_grid  # fell back to the operand program

    # gaussian mode -> operand path
    runner = engine.SlidingWindowRunner(predictor, mode="gaussian",
                                        sigma_scale=0.125, **kw)
    vol = jnp.asarray(rng.standard_normal((1, 8, 8, 6, 3)).astype(np.float32))
    out = runner(vol)
    assert out.shape == (1, 8, 8, 6, 4)
    (fn, wants_grid), = runner._programs.values()
    assert wants_grid
