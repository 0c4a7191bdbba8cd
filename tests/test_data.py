"""Data pipeline tests: transforms, datasets, split tool, loader."""

import json
import os

import numpy as np
import pytest

from lintransunet_tpu.data import (
    DataLoader,
    EvaPanCTDataset,
    IdPosPanCTDataset,
    MultiClassPanCTDataset,
    kfold_indices,
    load_fold,
    write_split_json,
)
from lintransunet_tpu.data import transforms as T


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic .npy CT volumes: (D, H, W) with a blob of foreground."""
    root = tmp_path_factory.mktemp("ct")
    os.makedirs(root / "image")
    os.makedirs(root / "label")
    rng = np.random.default_rng(0)
    for i in range(6):
        d = 12 + 2 * i
        img = rng.normal(40.0, 60.0, (d, 64, 64)).astype(np.float32)
        lbl = np.zeros((d, 64, 64), np.uint8)
        lbl[d // 3:d // 2, 20:40, 25:45] = 1
        if i % 2 == 0:
            lbl[d // 2:d // 2 + 2, 30:35, 30:35] = 2
        np.save(root / "image" / f"{i:04d}.npy", img)
        np.save(root / "label" / f"{i:04d}.npy", lbl)
    return str(root)


def test_hu_window_normalise():
    img = np.array([-200.0, 0.0, 300.0], np.float32)
    out = T.hu_window_normalise(img, -91, 250, 86.9, 39.4)
    np.testing.assert_allclose(
        out, (np.array([-91, 0, 250]) - 86.9) / 39.4, rtol=1e-5)


def test_scale_intensity_range_matches_linear_map():
    img = np.linspace(-200, 400, 13).astype(np.float32)
    out = T.scale_intensity_range(img, -96, 215, -2.0, 2.0, clip=True)
    assert out.min() >= -2.0 and out.max() <= 2.0
    mid = T.scale_intensity_range(np.array([59.5], np.float32),
                                  -96, 215, -2.0, 2.0)
    np.testing.assert_allclose(mid, [0.0], atol=1e-5)


def test_rand_crop_pos_neg_fixed_shapes_and_bias():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(40, 40, 10)).astype(np.float32)
    lbl = np.zeros((40, 40, 10), np.uint8)
    lbl[10:14, 10:14, 3:6] = 1
    imgs, lbls = T.rand_crop_by_pos_neg_label(
        img, lbl, (16, 16, 8), pos=0.7, neg=0.3, num_samples=50, rng=rng)
    assert imgs.shape == (50, 16, 16, 8)
    # with pos=0.7, most crops should contain foreground
    frac_fg = np.mean([l.sum() > 0 for l in lbls])
    assert frac_fg > 0.5


def test_rand_crop_pads_small_volumes():
    rng = np.random.default_rng(0)
    img = np.ones((8, 8, 4), np.float32)
    lbl = np.zeros((8, 8, 4), np.uint8)
    imgs, lbls = T.rand_crop_by_pos_neg_label(
        img, lbl, (16, 16, 8), 0.7, 0.3, 2, rng)
    assert imgs.shape == (2, 16, 16, 8)


def test_orient_ras():
    v = np.zeros((2, 3, 4))
    v[0, 0, 0] = 1
    out = T.orient_ras(v, "LPS")  # flip first two axes
    assert out[-1, -1, 0] == 1
    out2 = T.orient_ras(v, "RAS")
    np.testing.assert_array_equal(out2, v)


def test_spacing_resample_shapes():
    img = np.zeros((10, 10, 10), np.float32)
    lbl = np.zeros((10, 10, 10), np.uint8)
    out_i, out_l = T.spacing_resample(img, (1, 1, 1), (0.5, 0.5, 2.0),
                                      label=lbl)
    assert out_i.shape == (20, 20, 5)
    assert out_l.shape == (20, 20, 5)


def test_train_dataset_shapes(data_root):
    ds = IdPosPanCTDataset(data_root, depth_size=8, num_samples=3,
                           is_transform=True, ids=[0, 1], image_crop=32)
    imgs, lbls = ds[0]
    assert imgs.shape == (3, 32, 32, 8, 1)
    assert lbls.shape == (3, 32, 32, 8)
    assert lbls.dtype == np.uint8
    assert set(np.unique(lbls)) <= {0, 1}  # binary dataset binarises


def test_multiclass_dataset_keeps_ids(data_root):
    ds = MultiClassPanCTDataset(data_root, depth_size=8, num_samples=2,
                                is_transform=False, ids=[0], image_crop=32)
    _, lbls = ds[0]
    assert set(np.unique(lbls)) <= {0, 1, 2}


def test_eval_dataset_full_volume(data_root):
    ds = EvaPanCTDataset(data_root, depth_size=8, ids=[2])
    img, lbl = ds[0]
    assert img.shape == (1, 64, 64, 16, 1)
    assert lbl.shape == (1, 64, 64, 16)


def test_split_roundtrip(tmp_path):
    path = str(tmp_path / "split.json")
    out = write_split_json(20, path, n_splits=8, seed=0)
    with open(path) as f:
        data = json.load(f)
    assert set(data) == set(out)
    all_test = []
    for fold in range(8):
        train, test = load_fold(path, fold)
        assert sorted(train + test) == list(range(20))
        all_test += test
    assert sorted(all_test) == list(range(20))  # partition


def test_loader_prefetch_order(data_root):
    ds = EvaPanCTDataset(data_root, depth_size=8, ids=[0, 1, 2, 3])
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=3)
    depths = [img.shape[4] for img, _ in dl]  # (B, 1, H, W, D, 1)
    assert depths == [12, 14, 16, 18]  # in-order delivery despite threading
    assert len(dl) == 4


def test_loader_propagates_worker_exceptions():
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("bad sample")
            return (np.zeros((2, 2), np.float32),)

    dl = DataLoader(Boom(), batch_size=1, num_workers=2)
    with pytest.raises(ValueError, match="bad sample"):
        list(dl)


def test_rand_rotate_fires_at_monai_default_rate(data_root):
    """RandRotated defaults to prob=0.1 (the reference passes no prob);
    most training samples must come through unrotated."""
    ds = IdPosPanCTDataset(root=data_root, depth_size=4, num_samples=4,
                           is_transform=True, ids=[0, 1], image_crop=16,
                           seed=0)
    import inspect

    from lintransunet_tpu.data import datasets as D

    src = inspect.getsource(D)
    assert "rand_rotate" in src
    assert "prob=1.0" not in src.split("rand_rotate(")[1][:120]


def test_cache_pan_dataset_caches_and_randomises(data_root):
    from lintransunet_tpu.data import CachePanDataset, EvaPanDataset

    ds = CachePanDataset(root=data_root, depth_size=4, num_samples=2,
                         ids=[0, 1], image_crop=16, num_workers=2, seed=0)
    assert len(ds) == 2
    # deterministic preprocessing is cached once (same object on re-access)
    img_a, lbl_a = ds._cache[0]
    img_b, lbl_b = ds._cache[0]
    assert img_a is img_b and lbl_a is lbl_b
    # intensity scaling applied: values within the clipped normalised range
    lo = (ds.low_clip - ds.mean) / ds.std
    hi = (ds.high_clip - ds.mean) / ds.std
    assert img_a.min() >= lo - 1e-5 and img_a.max() <= hi + 1e-5

    imgs, lbls = ds[0]
    assert imgs.shape == (2, 16, 16, 4, 1)
    assert lbls.shape == (2, 16, 16, 4)
    assert lbls.dtype == np.uint8
    # random transforms re-draw per access (crops differ with high prob)
    imgs2, _ = ds[0]
    assert not np.array_equal(imgs, imgs2)

    eva = EvaPanDataset(root=data_root, depth_size=4, ids=[2],
                        num_workers=1)
    img, lbl = eva[0]
    assert img.shape[0] == 1 and img.shape[-1] == 1
    assert lbl.shape == img.shape[:-1]


# ---------------------------------------------------------------------------
# NIfTI ingestion + MONAI-pipeline fidelity (CT_pancreas_monai.py:37-48)
# ---------------------------------------------------------------------------

def _nifti_affine_lsp(spacing=(0.7, 2.5, 0.9)):
    """Affine whose array axes point (L, S, P) with the given spacings."""
    aff = np.zeros((4, 4))
    aff[0, 0] = -spacing[0]   # axis 0 -> -x  (L)
    aff[2, 1] = spacing[1]    # axis 1 -> +z  (S)
    aff[1, 2] = -spacing[2]   # axis 2 -> -y  (P)
    aff[:3, 3] = (10.0, -5.0, 3.0)
    aff[3, 3] = 1.0
    return aff


def test_nifti_roundtrip(tmp_path):
    from lintransunet_tpu.data import nifti

    rng = np.random.default_rng(3)
    vol = rng.normal(50.0, 30.0, (9, 7, 5)).astype(np.float32)
    aff = _nifti_affine_lsp()
    for name in ("a.nii", "b.nii.gz"):
        path = str(tmp_path / name)
        nifti.write_nifti(path, vol, aff)
        data, affine = nifti.read_nifti(path)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(affine, aff, rtol=1e-5, atol=1e-5)

    # integer payloads survive, and scl_slope/scl_inter are applied
    ivol = rng.integers(-500, 1500, (6, 5, 4)).astype(np.int16)
    path = str(tmp_path / "c.nii")
    nifti.write_nifti(path, ivol, np.eye(4))
    raw = bytearray(open(path, "rb").read())
    import struct

    struct.pack_into("<2f", raw, 112, 2.0, -10.0)  # slope, inter
    open(path, "wb").write(bytes(raw))
    data, _ = nifti.read_nifti(path)
    np.testing.assert_allclose(data, ivol.astype(np.float32) * 2.0 - 10.0)


def test_nifti_qform_affine(tmp_path):
    """qform fallback: identity quaternion -> diag(pixdim) affine."""
    from lintransunet_tpu.data import nifti

    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = str(tmp_path / "q.nii")
    nifti.write_nifti(path, vol, np.diag([1.5, 2.0, 3.0, 1.0]))
    raw = bytearray(open(path, "rb").read())
    import struct

    struct.pack_into("<2h", raw, 252, 1, 0)              # qform on, sform off
    struct.pack_into("<6f", raw, 256, 0, 0, 0, 4, 5, 6)  # b=c=d=0, offsets
    open(path, "wb").write(bytes(raw))
    data, affine = nifti.read_nifti(path)
    np.testing.assert_allclose(data, vol)
    expect = np.diag([1.5, 2.0, 3.0, 1.0])
    expect[:3, 3] = (4, 5, 6)
    np.testing.assert_allclose(affine, expect, atol=1e-6)


def test_affine_to_spacing_axcodes():
    spacing, codes = T.affine_to_spacing_axcodes(np.eye(4))
    assert codes == "RAS" and spacing == (1.0, 1.0, 1.0)
    spacing, codes = T.affine_to_spacing_axcodes(_nifti_affine_lsp())
    assert codes == "LSP"
    np.testing.assert_allclose(spacing, (0.7, 2.5, 0.9), rtol=1e-6)


def test_cache_pipeline_nifti_matches_scipy_oracle(tmp_path):
    """Default cached pipeline == scale -> orient-to-RAS -> Spacingd
    (affine-derived spacing), hand-computed with numpy/scipy."""
    from scipy import ndimage

    from lintransunet_tpu.data import CachePanDataset, nifti

    root = tmp_path / "nii"
    os.makedirs(root / "imagesTr")
    os.makedirs(root / "labelsTr")
    rng = np.random.default_rng(11)
    vol = rng.normal(60.0, 80.0, (10, 8, 12)).astype(np.float32)
    lbl = np.zeros_like(vol, dtype=np.uint8)
    lbl[3:6, 2:5, 4:9] = 1
    aff = _nifti_affine_lsp(spacing=(1.0, 4.0, 1.0))
    nifti.write_nifti(str(root / "imagesTr" / "v.nii.gz"), vol, aff)
    nifti.write_nifti(str(root / "labelsTr" / "v.nii.gz"), lbl, aff)

    ds = CachePanDataset(root=str(root), depth_size=2, num_samples=1,
                         image_crop=8, num_workers=1, train=False)
    img, label = ds._cache[0]

    # oracle: scale intensity, (L,S,P) -> RAS = transpose (0,2,1) + flip 0,1
    expect = np.clip((vol - (-96.0)) / (215.0 - (-96.0)), 0, 1)
    span_lo = (-96.0 - 77.99) / 75.4
    span_hi = (215.0 - 77.99) / 75.4
    expect = (expect * (span_hi - span_lo) + span_lo).astype(np.float32)
    expect = np.flip(np.flip(expect.transpose(0, 2, 1), 0), 1)
    lbl_r = np.flip(np.flip(lbl.transpose(0, 2, 1), 0), 1)
    # spacing after orient: (1.0, 0.9->? ) original axis spacings (1,4,1) in
    # (L,S,P) order; RAS order picks (L->R axis:1.0, P->A axis:1.0, S:4.0)
    zoom = (1.0 / 0.5, 1.0 / 0.5, 4.0 / 2.0)
    expect = ndimage.zoom(expect, zoom, order=1)
    lbl_r = ndimage.zoom(lbl_r, zoom, order=0)

    assert img.shape == expect.shape == (20, 24, 16)
    np.testing.assert_allclose(img, expect, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(label, lbl_r)


def test_cache_pipeline_npy_default_orients_and_resamples(data_root):
    """.npy sources: default SRA axcodes reduce orientation to the historic
    (D, H, W) -> (H, W, D) transpose, and Spacingd runs by default."""
    from scipy import ndimage

    from lintransunet_tpu.data import CachePanDataset

    ds = CachePanDataset(root=data_root, depth_size=2, num_samples=1,
                         ids=[0], image_crop=8, num_workers=1, train=False)
    img, _ = ds._cache[0]
    raw = np.load(os.path.join(data_root, "image", "0000.npy"))
    expect = np.clip((raw - (-96.0)) / (215.0 - (-96.0)), 0, 1)
    lo = (-96.0 - 77.99) / 75.4
    hi = (215.0 - 77.99) / 75.4
    expect = (expect * (hi - lo) + lo).astype(np.float32)
    expect = expect.transpose(1, 2, 0)          # SRA -> RAS == old transpose
    expect = ndimage.zoom(expect, (2.0, 2.0, 0.5), order=1)
    np.testing.assert_allclose(img, expect, rtol=1e-4, atol=1e-5)

    # orient=False, resample=False reproduces the legacy passthrough
    ds2 = CachePanDataset(root=data_root, depth_size=2, num_samples=1,
                          ids=[0], image_crop=8, num_workers=1, train=False,
                          resample=False, orient=False)
    img2, _ = ds2._cache[0]
    assert img2.shape == raw.transpose(1, 2, 0).shape
