"""Analytic per-stage floors for the 512x512x64 eval window forward.

For each stage of profile_stages.py's decomposition, compile on CPU and
read the HLO cost analysis: FLOPs and output bytes. Print the v5e
speed-of-light floors (197 TF/s bf16 MXU, ~819 GB/s HBM) so the TPU stage
timings (profile_stages.py / profile_xplane.py) can be read as
utilisation — which stage has real headroom left vs which is already at
its bound.

CPU-only (forces the cpu platform); analysis, no timing.

    python experiments/stage_flops.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.models import MaskTransUnet
from lintransunet_tpu.models.bridges import ConnectBridge, ROIBridge
from lintransunet_tpu.models.registry import one_hot_argmax
from lintransunet_tpu.models.unet import Encoder

ROI = (512, 512, 64)
DT = jnp.bfloat16
LAYERS = (16, 32, 64, 128, 256)
PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9      # v5e HBM GB/s


def audit(name, fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    out_bytes = ca.get("bytes accessedout{}", 0.0)
    t_mxu = flops / PEAK_TFLOPS * 1e3
    t_hbm = out_bytes / PEAK_HBM * 1e3
    print(f"{name:<46s} {flops/1e9:9.1f} GF {out_bytes/1e6:9.0f} MBout "
          f"floor mxu {t_mxu:6.2f} ms / hbm {t_hbm:6.2f} ms", flush=True)
    return flops, out_bytes


def main():
    rng = np.random.default_rng(0)
    total_f = total_b = 0.0

    enc = Encoder(num_layers=LAYERS, dim_input=1, packed_levels=2, dtype=DT)
    x = jnp.asarray(rng.standard_normal((1,) + ROI + (1,)), DT)
    p = jax.jit(lambda: enc.init(jax.random.PRNGKey(0), x, train=False))()
    f, b = audit("encoder packed_levels=2", lambda p, a: enc.apply(
        p, a, train=False), p, x)
    total_f += f; total_b += b

    cb = ConnectBridge(d_model=256, nhead=8, dropout=0.2, n_layers=8, dtype=DT)
    xb = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 256)), DT)
    pb = jax.jit(lambda: cb.init(jax.random.PRNGKey(0), xb, train=False))()
    f, b = audit("connect bridge 4096 tok d256 x8", lambda p, a: cb.apply(
        p, a, train=False), pb, xb)
    total_f += f; total_b += b

    for name, (in_dim, d_model, nhead, roi_sz, shape) in {
        "ROIBridge L3 (32,32,32,128) roi25":
            (128, 256, 8, 25, (1, 32, 32, 32, 128)),
        "ROIBridge L2 (64,64,32,64) roi40":
            (64, 256, 8, 40, (1, 64, 64, 32, 64)),
        "ROIBridge L1 (128,128,64,32) roi65":
            (32, 128, 4, 65, (1, 128, 128, 64, 32)),
    }.items():
        mod = ROIBridge(in_dim=in_dim, d_model=d_model, nhead=nhead,
                        n_layers=8, roi_size=roi_sz, dtype=DT)
        xr = jnp.asarray(rng.standard_normal(shape), DT)
        mask = jnp.asarray(rng.uniform(0, 1, shape[:-1] + (1,)), DT)
        pr = jax.jit(lambda m=mod, x=xr, mk=mask: m.init(
            jax.random.PRNGKey(0), x, mk, train=False))()
        f, b = audit(name, lambda p, a, m, md=mod: md.apply(
            p, a, m, train=False), pr, xr, mask)
        total_f += f; total_b += b

    logits = jnp.asarray(rng.standard_normal((1,) + ROI + (2,)), jnp.float32)
    f, b = audit("one_hot_argmax epilogue", lambda l: one_hot_argmax(l),
                 logits)
    total_f += f; total_b += b

    model = MaskTransUnet(
        num_layers=LAYERS, roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=DT)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + ROI + (1,), DT),
        train=False))()["params"]
    ff, fb = audit("FULL eval forward", lambda p, v: model.apply(
        {"params": p}, v, train=False), params, x)

    dec_f, dec_b = ff - total_f, fb - total_b
    print(f"{'=> decoder conv spine (full - stages)':<46s} "
          f"{dec_f/1e9:9.1f} GF {dec_b/1e6:9.0f} MBout "
          f"floor mxu {dec_f/PEAK_TFLOPS*1e3:6.2f} ms / "
          f"hbm {dec_b/PEAK_HBM*1e3:6.2f} ms")
    print(f"{'FULL floors':<46s} mxu {ff/PEAK_TFLOPS*1e3:6.2f} ms / "
          f"hbm {fb/PEAK_HBM*1e3:6.2f} ms  "
          f"(500 patches/s needs <= 37.9 ms/window)")


if __name__ == "__main__":
    main()

# Measured (CPU HLO, 2026-08-18) — note CPU promotes bf16 compute to f32,
# so byte figures are ~2x the TPU-true values for bf16 tensors:
#   encoder 674.8 GF / 4.6 GBout | connect bridge 37.5 GF | ROI L3 52.3 GF
#   ROI L2 91.7 GF | ROI L1 139.0 GF | epilogue 0.2 GF
#   FULL 3336.1 GF, 30.9 GBout (~15.5 GB bf16-true -> ~19 ms HBM floor)
#   decoder spine (by difference) 2340.6 GF = 70% of FLOPs.
# Reading: the spine is MXU-RATE-bound, not bandwidth-bound. At the paired
# K=N=128 rate (~99 TF/s) its floor is ~23 ms; bridges+encoder+epilogue
# ~15-20 ms more => ~40-45 ms/window structural floor (~440-470 patches/s)
# for the packed-dense 4x formulation. 500 needs either >99 TF/s sustained
# or a lower-inflation conv formulation (sheared was built and refuted).
