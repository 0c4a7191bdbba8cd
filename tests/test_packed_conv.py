"""Packed space-to-channel conv equivalence (exact kernel transformation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lintransunet_tpu import ops
from lintransunet_tpu.ops import packed_conv as pc


def test_stride1_packed_conv_matches_direct(rng):
    n, h, w, d, c, o = 1, 12, 10, 6, 3, 5
    x = rng.standard_normal((n, h, w, d, c)).astype(np.float32)
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    b = rng.standard_normal((o,)).astype(np.float32)

    ref = ops.conv3d(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b),
                     stride=1, padding=1)

    xp = ops.windows_embedding(jnp.asarray(x), 2)
    kp = pc.pack_kernel_stride1(k)
    bp = pc.pack_bias_stride1(b)
    got_p = pc.packed_conv3d_stride1(xp, jnp.asarray(kp), jnp.asarray(bp))
    got = ops.windows_unembedding(got_p, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stride2_packed_conv_matches_direct(rng):
    n, h, w, d, c, o = 1, 12, 10, 6, 3, 5
    x = rng.standard_normal((n, h, w, d, c)).astype(np.float32)
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)

    for z in (1, 2):
        ref = ops.conv3d(jnp.asarray(x), jnp.asarray(k), stride=(2, 2, z),
                         padding=1)
        xp = ops.windows_embedding(jnp.asarray(x), 2)
        kp = pc.pack_kernel_stride2(k)
        got = pc.packed_conv3d_stride2(xp, jnp.asarray(kp), z_stride=z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_group_instance_norm_matches_unpacked(rng):
    x = rng.standard_normal((2, 8, 8, 4, 6)).astype(np.float32)
    ref = ops.instance_norm(jnp.asarray(x))
    xp = ops.windows_embedding(jnp.asarray(x), 2)
    got_p = pc.group_instance_norm_packed(xp, channels=6)
    got = ops.windows_unembedding(got_p, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_packed_upsample_matches_resize_then_pack(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4, 3)).astype(np.float32))
    for z2 in (False, True):
        ref = ops.windows_embedding(
            ops.resize_linear_align_corners(x, (2, 2, 2 if z2 else 1)), 2)
        got = pc.packed_upsample_x2(x, z2=z2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_packed_top_model_matches_unpacked(rng):
    """packed_top=True must compute the same function with the same params."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False, return_aux=True)

    fast = MaskTransUnet(**kw, packed_levels=2)
    # same param tree must be accepted verbatim
    got_out, got_masks = fast.apply(variables, x, train=False, return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    assert len(got_masks) == len(ref_masks)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_packed_top_roi_level(rng):
    """Same check with an ROI bridge at the packed level (is_roi_list[0])."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, _ = base.apply(variables, x, train=False, return_aux=True)
    fast = MaskTransUnet(**kw, packed_levels=2)
    got_out, _ = fast.apply(variables, x, train=False, return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)


def test_packed_one_hot_argmax2_op(rng):
    """packed epilogue == one_hot_argmax(unembed(xp)) incl. the tie rule."""
    from lintransunet_tpu.models.registry import (
        one_hot_argmax, packed_one_hot_argmax2)

    xp = rng.standard_normal((2, 8, 8, 4, 32)).astype(np.float32)
    xp[0, 0, 0, 0, :] = 1.0  # exact tie -> class 0 (argmax first-max rule)
    xp = jnp.asarray(xp)
    ref = one_hot_argmax(ops.windows_unembedding(
        ops.windows_unembedding(xp, 2), 2))
    got = packed_one_hot_argmax2(xp)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_eval_branch_matches_unpacked(rng):
    """The packed eval branch (packed one-hot argmax epilogue) must equal
    the argmax of the packed model's own probabilities. (Direct comparison
    against the UNPACKED model is only rtol-1e-4 equal in logits, so
    near-tie voxels may legitimately flip across the two compute paths —
    softmax is order-preserving, so in-model probabilities give an exact
    argmax oracle for the same compute path.)"""
    import jax

    from lintransunet_tpu.models import MaskTransUnet
    from lintransunet_tpu.models.registry import one_hot_argmax

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    fast = MaskTransUnet(**kw, packed_levels=2)
    variables = fast.init(jax.random.PRNGKey(0), x, train=False)
    probs, _ = fast.apply(variables, x, train=False, return_aux=True)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(one_hot_argmax(probs)))


# ----------------------------------------------------------------- folded ops

def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4, 8)).astype(np.float32))
    xf = pc.fold_depth(x)
    assert xf.shape == (8, 6, 5, 8)
    np.testing.assert_array_equal(np.asarray(pc.unfold_depth(xf, 2)),
                                  np.asarray(x))


def test_folded_stride1_conv_matches_packed(rng):
    n, h2, w2, d, c, o = 2, 6, 5, 4, 3, 5
    xp = jnp.asarray(rng.standard_normal((n, h2, w2, d, 4 * c)).astype(np.float32))
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    kp = jnp.asarray(pc.pack_kernel_stride1(k))
    bp = jnp.asarray(pc.pack_bias_stride1(
        rng.standard_normal((o,)).astype(np.float32)))

    ref = pc.packed_conv3d_stride1(xp, kp, bp)
    xf = pc.fold_depth(xp)
    for formulation in ("3d", "taps"):
        got = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=n,
                                              formulation=formulation)
        np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, n)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_stride1_dspatial_matches_taps(rng):
    """The dspatial formulation (batch=H, spatial=(rows, W)) computes the
    same conv; tap regrouping makes it within-ulp, not bitwise. n>1 falls
    back to taps (the conv would leak across interior volume boundaries)."""
    h2, w2, d, c, o = 6, 5, 8, 3, 5
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    kp = jnp.asarray(pc.pack_kernel_stride1(k))
    bp = jnp.asarray(pc.pack_bias_stride1(
        rng.standard_normal((o,)).astype(np.float32)))
    xf = jnp.asarray(rng.standard_normal((d, h2, w2, 4 * c)).astype(np.float32))
    ref = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1,
                                          formulation="taps")
    got = pc.packed_conv3d_stride1_folded(xf, kp, bp, n_volumes=1,
                                          formulation="dspatial")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # resolve: dspatial64 gates on lane width
    assert pc.resolve_s1_formulation(64, "dspatial64") == "dspatial"
    assert pc.resolve_s1_formulation(128, "dspatial64") == "taps"
    # n>1 fallback stays correct (bitwise == taps, same code path)
    xf2 = jnp.asarray(
        rng.standard_normal((2 * d, h2, w2, 4 * c)).astype(np.float32))
    ref2 = pc.packed_conv3d_stride1_folded(xf2, kp, bp, n_volumes=2,
                                           formulation="taps")
    got2 = pc.packed_conv3d_stride1_folded(xf2, kp, bp, n_volumes=2,
                                           formulation="dspatial")
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))


def test_folded_stride2_conv_matches_packed(rng):
    n, h2, w2, d, c, o = 2, 6, 5, 4, 3, 5
    xp = jnp.asarray(rng.standard_normal((n, h2, w2, d, 4 * c)).astype(np.float32))
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    kp = jnp.asarray(pc.pack_kernel_stride2(k))
    b = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))

    for z in (1, 2):
        ref = pc.packed_conv3d_stride2(xp, kp, b, z_stride=z)
        got = pc.packed_conv3d_stride2_folded(pc.fold_depth(xp), kp, b,
                                              n_volumes=n, z_stride=z)
        np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, n)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_conv1x1_matches_packed(rng):
    n, h2, w2, d, c, o = 2, 6, 5, 4, 3, 5
    xp = jnp.asarray(rng.standard_normal((n, h2, w2, d, 4 * c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 1, c, o)).astype(np.float32))
    b = rng.standard_normal((o,)).astype(np.float32)
    kp = pc.pack_kernel_1x1_jnp(k)
    bp = pc.pack_bias_jnp(jnp.asarray(b))

    ref = ops.conv3d(xp, kp, bp, stride=1, padding=0)
    got = pc.packed_conv1x1_folded(pc.fold_depth(xp), kp, bp)
    np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, n)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_instance_norm_matches_packed(rng):
    xp = jnp.asarray(rng.standard_normal((2, 6, 5, 4, 12)).astype(np.float32))
    ref = pc.group_instance_norm_packed(xp, channels=3)
    got = pc.group_instance_norm_folded(pc.fold_depth(xp), channels=3,
                                        n_volumes=2)
    np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, 2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_folded_pack_unpack_matches_windows(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 6, 4, 3)).astype(np.float32))
    xp = ops.windows_embedding(x, 2)
    # pack_folded on the folded unpacked view == fold(windows_embedding(x))
    xfu = x.transpose(0, 3, 1, 2, 4).reshape(8, 8, 6, 3)
    got_p = pc.pack_folded(xfu)
    np.testing.assert_allclose(np.asarray(pc.unfold_depth(got_p, 2)),
                               np.asarray(xp), rtol=1e-6, atol=1e-6)
    # unpack_folded inverts it
    np.testing.assert_array_equal(np.asarray(pc.unpack_folded(got_p)),
                                  np.asarray(xfu))


def test_folded_upsample_matches_packed(rng):
    n, h, w, d, c = 2, 6, 5, 4, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, d, c)).astype(np.float32))
    for z2 in (False, True):
        ref = pc.packed_upsample_x2(x, z2=z2)
        xf = x.transpose(0, 3, 1, 2, 4).reshape(n * d, h, w, c)
        got = pc.packed_upsample_x2_folded(xf, n_volumes=n, z2=z2)
        np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, n)),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_s2_taps_matches_ndhwc(rng):
    """The depth-tap stride-2 formulation (kd NHWC convs over [strided]
    row slices) must match the one-NDHWC-conv form for both z strides."""
    h2, w2, d, c, o = 6, 5, 8, 3, 5
    xf = jnp.asarray(rng.standard_normal((d, h2, w2, 4 * c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_stride2_jnp(k)
    for z in (1, 2):
        ref = pc.packed_conv3d_stride2_folded(xf, kp, b, z_stride=z,
                                              formulation="ndhwc")
        got = pc.packed_conv3d_stride2_folded(xf, kp, b, z_stride=z,
                                              formulation="taps")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=f"z={z}")


def test_paired_upsample_matches_two_step(rng):
    """packed_upsample_x2_paired (pair-FIRST) must be bit-identical to
    fold_pairs(packed_upsample_x2_folded(...)): the dot contractions are
    the same multiplies, only the lane bookkeeping moves."""
    n, h, w, d, c = 2, 6, 5, 4, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, d, c)).astype(np.float32))
    xf = x.transpose(0, 3, 1, 2, 4).reshape(n * d, h, w, c)
    ref = pc.fold_pairs(pc.packed_upsample_x2_folded(xf, n_volumes=n), n)
    got = pc.packed_upsample_x2_paired(xf, n_volumes=n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_packed_in_upsample_matches_unpack_then_upsample(rng):
    """packed_upsample_x2_packed_in must match
    packed_upsample_x2_folded(unpack_folded(...)) for all (z2, pair)
    combinations — the merged (row, sub-lane-phase) contraction computes
    the same <=2-term align-corners sums."""
    n, h2, w2, d, c = 2, 5, 6, 4, 3
    xp = jnp.asarray(
        rng.standard_normal((n * d, h2, w2, 4 * c)).astype(np.float32))
    for z2 in (False, True):
        ref = pc.packed_upsample_x2_folded(pc.unpack_folded(xp),
                                           n_volumes=n, z2=z2)
        got = pc.packed_upsample_x2_packed_in(xp, n_volumes=n, z2=z2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6, err_msg=f"z2={z2}")
    ref_p = pc.fold_pairs(
        pc.packed_upsample_x2_folded(pc.unpack_folded(xp), n_volumes=n), n)
    got_p = pc.packed_upsample_x2_packed_in(xp, n_volumes=n, pair=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-6, atol=1e-6)


def test_folded_sheared_conv_matches_packed(rng):
    n, h2, w2, d, c, o = 2, 6, 5, 4, 3, 5
    xp = jnp.asarray(rng.standard_normal((n, h2, w2, d, 4 * c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, o)).astype(np.float32))
    kp = pc.pack_kernel_stride1_jnp(k)
    ks = pc.pack_kernel_stride1_sheared_jnp(k)
    bp = jnp.asarray(pc.pack_bias_stride1(
        rng.standard_normal((o,)).astype(np.float32)))

    ref = pc.packed_conv3d_stride1(xp, kp, bp)
    got = pc.packed_conv3d_stride1_sheared_folded(pc.fold_depth(xp), ks, bp,
                                                  n_volumes=n)
    np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, n)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_plain_instance_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4, 3)).astype(np.float32))
    ref = ops.instance_norm(x)
    got = pc.instance_norm_folded(pc.fold_depth(x), n_volumes=2)
    np.testing.assert_allclose(np.asarray(pc.unfold_depth(got, 2)),
                               np.asarray(ref), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------- folded model path

@pytest.mark.slow
def test_folded_model_matches_packed(rng):
    """folded=True must compute the same function with the same params as
    the packed 5D path (both branches, batch > 1)."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2,
              packed_levels=2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw, folded=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False, return_aux=True)

    fast = MaskTransUnet(**kw, folded=True)
    got_out, got_masks = fast.apply(variables, x, train=False, return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    assert len(got_masks) == len(ref_masks)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_folded_model_roi_level(rng):
    """Folded equivalence with an ROI bridge at the packed levels."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw, folded=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, _ = base.apply(variables, x, train=False, return_aux=True)
    fast = MaskTransUnet(**kw, folded=True)
    got_out, _ = fast.apply(variables, x, train=False, return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)


def test_folded_eval_branch_matches_packed_eval(rng):
    """The folded eval epilogue (folded_one_hot_argmax2) must equal the
    argmax of the folded model's own probabilities."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet
    from lintransunet_tpu.models.registry import one_hot_argmax

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    fast = MaskTransUnet(**kw)
    variables = fast.init(jax.random.PRNGKey(0), x, train=False)
    probs, _ = fast.apply(variables, x, train=False, return_aux=True)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(one_hot_argmax(probs)))


# ------------------------------------------------------------- prepack plan

@pytest.mark.parametrize("folded", [False, True])
def test_prepack_params_equivalence(rng, folded):
    """prepack_params must be a pure re-representation: the same apply on
    the prepacked tree computes bit-identical outputs (the PackedConv just
    skips its per-forward kernel transform)."""
    import jax

    from lintransunet_tpu.models import (MaskTransUnet, prepack_params,
                                         prepack_plan)

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=folded)
    model = MaskTransUnet(**kw)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # plan from an abstract example (no device memory)
    plan = prepack_plan(model, jax.ShapeDtypeStruct(x.shape, x.dtype))
    assert plan and all(
        k in ("dense", "sheared", "s2", "1x1") for _, k, _ in plan)
    pp = prepack_params(model, variables["params"], None, plan=plan)
    # re-prepacking an already-packed tree is a no-op (shape guard)
    pp2 = prepack_params(model, pp, None, plan=plan)
    for a, b in zip(jax.tree_util.tree_leaves(pp),
                    jax.tree_util.tree_leaves(pp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ref, ref_masks = model.apply(variables, x, train=False, return_aux=True)
    got, got_masks = model.apply({"params": pp}, x, train=False,
                                 return_aux=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_prepack_params_unpacked_model_noop(rng):
    """A model with no packed levels yields an empty plan and unchanged
    params."""
    import jax

    from lintransunet_tpu.models import (MaskTransUnet, prepack_params,
                                         prepack_plan)

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2,
              packed_levels=0)
    model = MaskTransUnet(**kw)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    plan = prepack_plan(model, jax.ShapeDtypeStruct(x.shape, x.dtype))
    assert plan == []
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pp = prepack_params(model, variables["params"], None, plan=plan)
    ref = model.apply(variables, x, train=False)
    got = model.apply({"params": pp}, x, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ------------------------------------------------------- paired (8C) layout

def test_fold_unfold_pairs_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2 * 6, 5, 4, 12)).astype(np.float32))
    x8 = pc.fold_pairs(x, n_volumes=2)
    assert x8.shape == (2 * 3, 5, 4, 24)
    np.testing.assert_array_equal(np.asarray(pc.unfold_pairs(x8, 2)),
                                  np.asarray(x))


def test_paired_stride1_matches_folded(rng):
    """packed_conv3d_stride1_paired == packed_conv3d_stride1_folded on the
    same underlying tensor (multi-volume, odd channel counts)."""
    n, d, h2, w2, c, o = 2, 6, 5, 4, 3, 2
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3, c, o))
                         .astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_stride1_jnp(kernel)
    bp = pc.pack_bias_jnp(bias)
    ref = pc.packed_conv3d_stride1_folded(x, kp, bp, n_volumes=n)
    got8 = pc.packed_conv3d_stride1_paired(
        pc.fold_pairs(x, n), kp, bp, n_volumes=n)
    np.testing.assert_allclose(np.asarray(pc.unfold_pairs(got8, n)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_paired_1x1_matches_folded(rng):
    n, d, h2, w2, c, o = 1, 4, 3, 3, 2, 5
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((1, 1, 1, c, o))
                         .astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_1x1_jnp(kernel)
    bp = pc.pack_bias_jnp(bias)
    ref = pc.packed_conv1x1_folded(x, kp, bp)
    got8 = pc.packed_conv1x1_paired(pc.fold_pairs(x, n), kp, bp)
    np.testing.assert_allclose(np.asarray(pc.unfold_pairs(got8, n)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_paired_instance_norm_matches_folded(rng):
    n, d, h2, w2, c = 2, 4, 5, 3, 3
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    ref = pc.group_instance_norm_folded(x, c, n_volumes=n)
    got8 = pc.group_instance_norm_paired(pc.fold_pairs(x, n), c, n_volumes=n)
    np.testing.assert_allclose(np.asarray(pc.unfold_pairs(got8, n)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_paired_scale_matches_packed(rng):
    n, d, h2, w2, c = 1, 4, 3, 3, 3
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4))
                       .astype(np.float32))
    ref = pc.packed_scale(x, gate, c)
    got8 = pc.packed_scale_paired(pc.fold_pairs(x, n),
                                  pc.fold_pairs(gate, n), c)
    np.testing.assert_allclose(np.asarray(pc.unfold_pairs(got8, n)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("prepacked", [False, True])
def test_paired_model_matches_folded(rng, prepacked):
    """paired=True must compute the same function with the same params as
    the folded path (both branches, ROI bridges at the packed levels,
    batch > 1), including composed with prepack_params."""
    import jax

    from lintransunet_tpu.models import (MaskTransUnet, prepack_params,
                                         prepack_plan)

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw, paired=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False,
                                    return_aux=True)

    fast = MaskTransUnet(**kw, paired=True)
    params = variables["params"]
    if prepacked:
        params = prepack_params(
            fast, params, None,
            plan=prepack_plan(fast, jax.ShapeDtypeStruct(x.shape, x.dtype)))
    got_out, got_masks = fast.apply({"params": params}, x, train=False,
                                    return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_paired_training_grads_match_folded(rng):
    """Gradients through the paired layout must match the folded path: the
    paired ops are exact reformulations, so the backward (transpose convs
    through fold_pairs, half-lane boundary taps) differs only by summation
    order. Guards the training path before paired becomes a default."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True, n_layers=2, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    labels = jnp.asarray((rng.random((2, 32, 32, 4)) > 0.7).astype(np.float32))

    def loss_and_grads(paired):
        model = MaskTransUnet(**kw, paired=paired)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss_fn(params):
            out, mask_list = model.apply(
                {"params": params}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)})
            total = jnp.mean((out[..., 1] - labels) ** 2)
            for m in mask_list:
                total = total + jnp.mean(m[..., 1] ** 2)
            return total

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"])
        return float(loss), jax.tree_util.tree_map(np.asarray, grads)

    loss0, g0 = loss_and_grads(False)
    loss1, g1 = loss_and_grads(True)
    assert loss0 == pytest.approx(loss1, rel=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    assert len(flat0) == len(flat1)
    for (p0, a0), (p1, a1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(a0, a1, rtol=5e-4, atol=1e-5,
                                   err_msg=str(p0))


def test_paired_eval_branch(rng):
    """The paired eval epilogue path must equal the argmax of the paired
    model's own probabilities."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet
    from lintransunet_tpu.models.registry import one_hot_argmax

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True, paired=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    fast = MaskTransUnet(**kw)
    variables = fast.init(jax.random.PRNGKey(0), x, train=False)
    probs, _ = fast.apply(variables, x, train=False, return_aux=True)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(one_hot_argmax(probs)))


@pytest.mark.slow
def test_packed_eval_branch_multiclass(rng):
    """dim_output=3 packed eval epilogue (generalised lane argmax) must
    equal the argmax of the model's own probabilities."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet
    from lintransunet_tpu.models.registry import one_hot_argmax

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(8, 6, 4),
              is_roi_list=(False, True, True), dim_input=1, dim_output=3,
              packed_levels=2, folded=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 4, 1)).astype(np.float32))
    fast = MaskTransUnet(**kw)
    variables = fast.init(jax.random.PRNGKey(0), x, train=False)
    probs, _ = fast.apply(variables, x, train=False, return_aux=True)
    got = fast.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(one_hot_argmax(probs)))


def test_packed_lane_one_hot_tie_rule(rng):
    """Generalised lane argmax reproduces jnp.argmax's first-max tie rule."""
    from lintransunet_tpu.models.registry import (one_hot_argmax,
                                                  packed_one_hot_argmax)

    xp = rng.standard_normal((2, 4, 4, 2, 48)).astype(np.float32)
    xp[0, 0, 0, 0, :] = 1.0  # 3-way tie -> class 0
    xp[0, 1, 0, 0, 16:] = 2.0  # tie between classes 1 and 2 -> class 1
    xp = jnp.asarray(xp)
    ref = one_hot_argmax(ops.windows_unembedding(
        ops.windows_unembedding(xp, 2), 2))
    got = packed_one_hot_argmax(xp, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
@pytest.mark.parametrize("prepacked", [False, True])
def test_sheared_model_matches_default(rng, prepacked, monkeypatch):
    """Forcing the sheared stride-1 formulation (LINTRANSUNET_FOLDED_S1=
    sheared, the 16/9x-FLOPs transform) must compute the same function with
    the same raw params as the default formulation, including composed with
    prepack_params (pre-sheared (2,2,kd,4C,4O) kernels)."""
    import jax

    from lintransunet_tpu.models import (MaskTransUnet, prepack_params,
                                         prepack_plan)

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False,
                                    return_aux=True)

    monkeypatch.setattr(pc, "FOLDED_S1_FORMULATION", "sheared")
    fast = MaskTransUnet(**kw)
    params = variables["params"]
    if prepacked:
        params = prepack_params(
            fast, params, None,
            plan=prepack_plan(fast, jax.ShapeDtypeStruct(x.shape, x.dtype)))
    got_out, got_masks = fast.apply({"params": params}, x, train=False,
                                    return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("prepacked", [False, True])
def test_sheared_paired_model_matches_default(rng, prepacked, monkeypatch):
    """Sheared + paired composed (both levers on the narrow levels) must
    compute the same function with the same raw params as the baseline
    folded path, including composed with prepack_params."""
    import jax

    from lintransunet_tpu.models import (MaskTransUnet, prepack_params,
                                         prepack_plan)

    kw = dict(num_layers=(8, 16, 32), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw, paired=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False,
                                    return_aux=True)

    monkeypatch.setattr(pc, "FOLDED_S1_FORMULATION", "sheared64")
    fast = MaskTransUnet(**kw, paired=True)
    params = variables["params"]
    if prepacked:
        params = prepack_params(
            fast, params, None,
            plan=prepack_plan(fast, jax.ShapeDtypeStruct(x.shape, x.dtype)))
    got_out, got_masks = fast.apply({"params": params}, x, train=False,
                                    return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_sheared_paired_op_matches_paired(rng):
    """Op-level: sheared-paired == dense-paired on multi-volume inputs."""
    n, h2, w2, d, c, o = 2, 6, 5, 4, 3, 5
    x = rng.standard_normal((n, 2 * h2, 2 * w2, d, c)).astype(np.float32)
    k = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    b = rng.standard_normal((o,)).astype(np.float32)
    x8 = pc.fold_pairs(pc.fold_depth(
        ops.windows_embedding(jnp.asarray(x), 2)), n)
    kd = pc.pack_kernel_stride1_jnp(jnp.asarray(k))
    ks = pc.pack_kernel_stride1_sheared_jnp(jnp.asarray(k))
    bp = pc.pack_bias_jnp(jnp.asarray(b))
    ref = pc.packed_conv3d_stride1_paired(x8, kd, bp, n_volumes=n)
    got = pc.packed_conv3d_stride1_sheared_paired(x8, ks, bp, n_volumes=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_paired_wide_gate_matches_folded(rng, monkeypatch):
    """PAIRED_MAX_4C=128 (pairing a 4C=128 level, 8C=256 lanes) must stay
    exact — the paired ops are channel-generic; only the gate widens."""
    import jax

    from lintransunet_tpu.models import MaskTransUnet
    from lintransunet_tpu.models import unet as unet_mod

    kw = dict(num_layers=(16, 32, 64), roi_size_list=(6, 6, 4),
              is_roi_list=(True, True, True), dim_input=1, dim_output=2,
              packed_levels=2, folded=True, n_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32))
    base = MaskTransUnet(**kw, paired=False)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    ref_out, ref_masks = base.apply(variables, x, train=False,
                                    return_aux=True)

    monkeypatch.setattr(unet_mod, "PAIRED_MAX_4C", 128)
    fast = MaskTransUnet(**kw, paired=True)
    got_out, got_masks = fast.apply(variables, x, train=False,
                                    return_aux=True)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    for g, r in zip(got_masks, ref_masks):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_paired_stride1_3d_formulation_matches_pads(rng):
    """The zero-blocked 3-tap "3d" paired formulation must equal the
    pad-based one (and hence the folded reference) — same function, the
    boundary taps just ride the conv accumulator instead of materialised
    row-shifted copies."""
    n, d, h2, w2, c, o = 2, 6, 5, 4, 3, 2
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3, c, o))
                         .astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_stride1_jnp(kernel)
    bp = pc.pack_bias_jnp(bias)
    x8 = pc.fold_pairs(x, n)
    ref = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=n,
                                          formulation="pads")
    got = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=n,
                                          formulation="3d")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paired_stride1_bd_ext_formulations_match_pads(rng):
    """The block-diagonal boundary-tap "bd" and the single-conv "ext"
    paired formulations must equal the pad-based one — same function,
    the boundary taps just run at the full K=N=8C (bd) / K=16C (ext)
    MXU width instead of two 4C-wide convs."""
    n, d, h2, w2, c, o = 2, 6, 5, 4, 3, 2
    x = jnp.asarray(rng.standard_normal((n * d, h2, w2, 4 * c))
                    .astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((3, 3, 3, c, o))
                         .astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32))
    kp = pc.pack_kernel_stride1_jnp(kernel)
    bp = pc.pack_bias_jnp(bias)
    x8 = pc.fold_pairs(x, n)
    ref = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=n,
                                          formulation="pads")
    for formulation in ("bd", "ext"):
        got = pc.packed_conv3d_stride1_paired(x8, kp, bp, n_volumes=n,
                                              formulation=formulation)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=formulation)


def test_in_stats_dot_matches_reduce(rng, monkeypatch):
    """IN_STATS=dot (ones-matvec sums + Gram-diagonal square sums on the
    MXU) must match the fused-reduction stats on all three IN variants —
    same statistics, different accumulation route."""
    n, d, h, w, c = 2, 4, 5, 6, 3
    for name, make, args in [
        ("folded", lambda x: pc.group_instance_norm_folded(
            x, c, n_volumes=n), (n * d, h, w, 4 * c)),
        ("paired", lambda x: pc.group_instance_norm_paired(
            x, c, n_volumes=n), (n * (d // 2), h, w, 8 * c)),
        ("plain", lambda x: pc.instance_norm_folded(
            x, n_volumes=n), (n * d, h, w, c)),
    ]:
        x = jnp.asarray(rng.standard_normal(args).astype(np.float32) * 3 + 1)
        monkeypatch.setattr(pc, "IN_STATS", "reduce")
        ref = np.asarray(make(x))
        monkeypatch.setattr(pc, "IN_STATS", "dot")
        got = np.asarray(make(x))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=name)


def test_in_stats_unfused_matches_reduce(rng, monkeypatch):
    """IN_STATS=unfused (optimization_barrier forces the stat reductions
    out of the producer fusion) must be BIT-identical to the fused default
    — the barrier is an identity; only XLA's fusion grouping changes."""
    from lintransunet_tpu.ops import conv as cv

    n, d, h, w, c = 2, 4, 5, 6, 3
    for name, make, args in [
        ("folded", lambda x: pc.group_instance_norm_folded(
            x, c, n_volumes=n), (n * d, h, w, 4 * c)),
        ("paired", lambda x: pc.group_instance_norm_paired(
            x, c, n_volumes=n), (n * (d // 2), h, w, 8 * c)),
        ("plain", lambda x: pc.instance_norm_folded(
            x, n_volumes=n), (n * d, h, w, c)),
        ("unpacked5d", lambda x: cv.instance_norm(x),
         (n, h, w, d, c)),
    ]:
        x = jnp.asarray(rng.standard_normal(args).astype(np.float32) * 3 + 1)
        monkeypatch.setattr(cv, "IN_STATS", "reduce")
        ref = np.asarray(make(x))
        monkeypatch.setattr(cv, "IN_STATS", "unfused")
        got = np.asarray(make(x))
        np.testing.assert_array_equal(got, ref, err_msg=name)


@pytest.mark.parametrize("paired", [True, False])
def test_upblock_dual_matches_concat(rng, monkeypatch, paired):
    """UPBLOCK_DUAL (merge conv as the sum of two half-kernel convs, no
    materialised skip concat) == the concat path on PackedUpBlock — the
    same contraction split by input rows."""
    import jax

    from lintransunet_tpu.models import packed as pk_models

    c, h, w, dp, n = 4, 8, 8, 4, 2
    mult = 2 if paired else 1
    rows = n * dp if paired else n * 2 * dp
    xu = jnp.asarray(
        rng.standard_normal((rows, h, w, 4 * mult * 2 * c)).astype(
            np.float32))
    skip = jnp.asarray(
        rng.standard_normal((rows, h, w, 4 * mult * c)).astype(np.float32))

    up = pk_models.PackedUpBlock(in_channels=2 * c, out_channels=c,
                                 dtype=jnp.float32)
    params = up.init(jax.random.PRNGKey(3), xu, skip, train=False,
                     n_volumes=n, paired=paired)

    monkeypatch.setattr(pk_models, "UPBLOCK_DUAL", False)
    ref = np.asarray(up.apply(params, xu, skip, train=False, n_volumes=n,
                              paired=paired))
    monkeypatch.setattr(pk_models, "UPBLOCK_DUAL", True)
    got = np.asarray(up.apply(params, xu, skip, train=False, n_volumes=n,
                              paired=paired))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [1, 2])
@pytest.mark.parametrize("z_stride", [1, 2])
def test_paired_s2_conv_matches_folded(rng, n, z_stride):
    """packed_conv3d_stride2_paired == packed_conv3d_stride2_folded on the
    unfold_pairs view, for both depth strides and volume counts (the pair
    row IS the z2 depth window; z1 returns pair-lane rows)."""
    h2, w2, d, c, o = 6, 5, 8, 3, 5
    kernel = rng.standard_normal((3, 3, 3, c, o)).astype(np.float32)
    bias = rng.standard_normal((o,)).astype(np.float32)
    kp = pc.pack_kernel_stride2_jnp(jnp.asarray(kernel))
    xf = jnp.asarray(
        rng.standard_normal((n * d, h2, w2, 4 * c)).astype(np.float32))
    x8 = pc.fold_pairs(xf, n)
    ref = pc.packed_conv3d_stride2_folded(
        xf, kp, jnp.asarray(bias), n_volumes=n, z_stride=z_stride,
        formulation="taps" if n == 1 else "ndhwc")
    got = pc.packed_conv3d_stride2_paired(
        x8, kp, jnp.asarray(bias), n_volumes=n, z_stride=z_stride)
    if z_stride == 1:
        got = pc.unfold_pair_lanes(got, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_pairs_matches_folded(rng):
    n, dp, h, w, o = 2, 4, 6, 5, 7
    xq = jnp.asarray(
        rng.standard_normal((n * dp, h, w, 2 * o)).astype(np.float32))
    ref = pc.instance_norm_folded(pc.unfold_pair_lanes(xq, n), n_volumes=n)
    got = pc.unfold_pair_lanes(pc.instance_norm_pairs(xq, n_volumes=n), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_folded_from_pairs_matches_two_step(rng):
    n, dp, h, w, o = 2, 3, 8, 6, 5
    xq = jnp.asarray(
        rng.standard_normal((n * dp, h, w, 2 * o)).astype(np.float32))
    ref = pc.pack_folded(pc.unfold_pair_lanes(xq, n))
    got = pc.pack_folded_from_pairs(xq, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
