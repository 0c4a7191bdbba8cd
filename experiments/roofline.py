"""Whole-window roofline: is 500 patches/s/chip reachable at this formulation?

The target arithmetic (BASELINE.json): 500 x 96^3 patches/s/chip. One eval
window (512x512x64, the reference eval geometry at
utils/utils_3D_embed_full.py:135-148) is 512*512*64/96^3 = 18.963 patch
equivalents, so 500 p/s == 18.963/500 = 37.93 ms/window END TO END.

This script compiles the SHIPPING eval-window forward (prepacked params,
fg-only epilogue — exactly what bench.py runs per window) on whatever
backend is available and reads XLA's own post-optimisation cost analysis:
total FLOPs and total bytes accessed. Floors:

    t_mxu = flops / 197e12   (v5e bf16 MXU peak)
    t_hbm = bytes / 819e9    (v5e HBM bandwidth)
    floor = max(t_mxu, t_hbm)

It also prints the per-window floor with the packed-4x inflation backed
out (the "reference-formulation useful FLOPs") to separate what the
formulation costs from what the hardware demands.

    python experiments/roofline.py            # uses default backend (TPU)
    JAX_PLATFORMS=cpu python experiments/roofline.py   # flops identical
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lintransunet_tpu.engine import make_eval_forward
from lintransunet_tpu.models import MaskTransUnet, prepack_params

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9      # v5e HBM bytes/s
ROI = (512, 512, 64)
PATCH_EQUIV = ROI[0] * ROI[1] * ROI[2] / 96 ** 3   # 18.963
TARGET_MS = PATCH_EQUIV / 500 * 1e3                # 37.93 ms/window


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts, ca


def train_roofline():
    """Same analysis for the training step (bench.py --train workload)."""
    from lintransunet_tpu import engine
    from lintransunet_tpu.cli.common import get_criterion_list
    from lintransunet_tpu.engine.schedule import get_dynamic_weight
    from lintransunet_tpu.losses import binary as loss_module

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    shape = (1, 512, 512, 32, 1)
    images = jnp.zeros(shape, jnp.bfloat16)
    labels = jnp.zeros(shape[:4], jnp.int32)
    state = engine.create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros(shape, jnp.bfloat16),
        learning_rate=1e-4)
    criterions, _ = get_criterion_list(
        5, ["CrossEntroLoss", "DiceClassLoss"], loss_module)
    step_fn = engine.make_train_step(model, criterions, donate=False)
    dyn_w = jnp.asarray(get_dynamic_weight(
        epochs=1, T=12.0, warmup_step=10,
        weight_list=(0.05, 0.05, 0.1, 0.1, 1.0),
        initial_weight=(0.1, 0.2, 0.3, 0.4, 1.0),
        final_weight=(2.0, 1.5, 1.0, 1.0, 1.0))[0], jnp.float32)
    compiled = step_fn.lower(
        state, images, labels, dyn_w, jax.random.PRNGKey(1)).compile()
    flops, byts, _ = cost(compiled)
    t_mxu = flops / PEAK_TFLOPS * 1e3
    t_hbm = byts / PEAK_HBM * 1e3
    print(f"\ntrain step (512x512x32 patch, batch 1, deep supervision, "
          f"AdamW):")
    print(f"  flops = {flops/1e12:.3f} TF   bytes = {byts/1e9:.3f} GB")
    print(f"  floors: mxu {t_mxu:.2f} ms  hbm {t_hbm:.2f} ms  -> "
          f"roofline {max(t_mxu, t_hbm):.2f} ms/step")
    meas = 130.0
    print(f"  measured {meas:.1f} ms/step -> "
          f"{flops/(meas/1e3)/1e12:.1f} TF/s "
          f"({flops/(meas/1e3)/PEAK_TFLOPS*100:.0f}% MXU), "
          f"{byts/(meas/1e3)/1e9:.0f} GB/s "
          f"({byts/(meas/1e3)/PEAK_HBM*100:.0f}% HBM)")


def main():
    if "--train" in sys.argv:
        print(f"backend: {jax.default_backend()}")
        return train_roofline()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"window = {ROI}  patch_equiv = {PATCH_EQUIV:.3f}  "
          f"target (500 p/s) = {TARGET_MS:.2f} ms/window")

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    x = jnp.zeros((1,) + ROI + (1,), jnp.bfloat16)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x, train=False))()["params"]
    params = prepack_params(model, params, x)
    forward = make_eval_forward(model)

    compiled = jax.jit(forward).lower(params, x).compile()
    flops, byts, ca = cost(compiled)
    t_mxu = flops / PEAK_TFLOPS * 1e3
    t_hbm = byts / PEAK_HBM * 1e3
    floor = max(t_mxu, t_hbm)
    print(f"\nXLA post-optimisation cost analysis of the shipping window "
          f"forward:")
    print(f"  flops          = {flops/1e12:.3f} TF")
    print(f"  bytes accessed = {byts/1e9:.3f} GB")
    print(f"  t_mxu floor    = {t_mxu:.2f} ms/window")
    print(f"  t_hbm floor    = {t_hbm:.2f} ms/window")
    print(f"  roofline floor = {floor:.2f} ms/window "
          f"-> {PATCH_EQUIV/ (floor/1e3):.0f} patches/s/chip ceiling")
    print(f"  target needs   = {TARGET_MS:.2f} ms/window; "
          f"floor/target = {floor/TARGET_MS:.2f}x")

    # Transformer/other cost breakdown: conv flops dominate; report the
    # utilisation the measured 63.65 ms/window implies.
    measured = 63.65
    print(f"\nmeasured device time (docs/DESIGN.md session-close) = "
          f"{measured:.2f} ms/window")
    print(f"  achieved MXU rate = {flops/ (measured/1e3) / 1e12:.1f} TF/s "
          f"({flops/(measured/1e3)/PEAK_TFLOPS*100:.0f}% of peak)")
    print(f"  achieved HBM rate = {byts/(measured/1e3)/1e9:.0f} GB/s "
          f"({byts/(measured/1e3)/PEAK_HBM*100:.0f}% of peak)")

    # Other cost-analysis keys worth recording
    for k in sorted(ca):
        if "bytes accessed" in k and k != "bytes accessed":
            v = ca[k]
            if v > 1e9:
                print(f"  {k} = {v/1e9:.2f} GB")

    if "--full" not in sys.argv:
        return

    # The same analysis for the UNPACKED formulation (packed_levels=0):
    # separates what the packed-4x inflation costs in FLOPs from what it
    # saves in layout/traffic.
    model_u = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=0, dtype=jnp.bfloat16)
    params_u = jax.jit(lambda: model_u.init(
        jax.random.PRNGKey(0), x, train=False))()["params"]
    params_u = prepack_params(model_u, params_u, x)
    fwd_u = make_eval_forward(model_u)
    flops_u, byts_u, _ = cost(jax.jit(fwd_u).lower(params_u, x).compile())
    print(f"\nunpacked (packed_levels=0) same window:")
    print(f"  flops = {flops_u/1e12:.3f} TF  (packed/unpacked = "
          f"{flops/flops_u:.2f}x)")
    print(f"  bytes = {byts_u/1e9:.3f} GB  "
          f"floors mxu {flops_u/PEAK_TFLOPS*1e3:.2f} / "
          f"hbm {byts_u/PEAK_HBM*1e3:.2f} ms")

    # End-to-end: the whole 5-window volume program the bench runs
    # (slice + forward + blend + normalise), per window.
    from lintransunet_tpu.engine import SlidingWindowRunner

    runner = SlidingWindowRunner(
        lambda xb, p: forward(p, xb), ROI, 1, overlap=0.6,
        mode="constant", depth_bucket=ROI[2], chunk_bucket=1,
        derive_background=forward.fg_only)
    vol = jnp.zeros((1, 512, 512, 144, 1), jnp.bfloat16)
    starts, weights, norm = runner._grid(vol.shape)
    pad_d = (-vol.shape[3]) % runner.depth_bucket
    vol = jnp.pad(vol, ((0, 0), (0, 0), (0, 0), (0, pad_d), (0, 0)))
    fn = runner._compiled(vol.shape, starts.shape[0])
    comp_v = fn.lower(vol, norm=norm, importance=None,
                      predictor_args=(params,), window_starts=starts,
                      window_weights=weights).compile()
    flops_v, byts_v, _ = cost(comp_v)
    nwin = 5
    print(f"\nfull 5-window volume program (what bench.py runs):")
    print(f"  flops = {flops_v/1e12:.3f} TF total, "
          f"{flops_v/nwin/1e12:.3f} TF/window")
    print(f"  bytes = {byts_v/1e9:.3f} GB total, "
          f"{byts_v/nwin/1e9:.3f} GB/window")
    fw = max(flops_v / PEAK_TFLOPS, byts_v / PEAK_HBM) / nwin * 1e3
    print(f"  roofline floor = {fw:.2f} ms/window -> "
          f"{PATCH_EQUIV/(fw/1e3):.0f} patches/s ceiling")


if __name__ == "__main__":
    main()
