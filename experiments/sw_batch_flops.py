"""Is the sw_batch>1 slowdown in the MATH or in the COMPILER?

sw_batch_probe measured the standalone eval-window forward at 112.6 ms
(batch 1) -> 145.4 ms/window... wait, 290.8 total (batch 2), i.e. +29%
per window. This probe lowers the same forward at batch 1 and 2 and
compares the analytical HLO cost (flops / bytes accessed). Linear
scaling (ratio ~2.0) exonerates the model math and pins the regression
on backend decisions (layout/tiling/VMEM pressure at the doubled
shapes); a superlinear ratio names the offending op family.

CPU-safe: lowering only, no compile/execute of the big program.

    JAX_PLATFORMS=cpu python experiments/sw_batch_flops.py [--depth 64]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=64)
    args = ap.parse_args()

    from lintransunet_tpu.engine import make_eval_forward
    from lintransunet_tpu.models import MaskTransUnet

    model = MaskTransUnet(
        num_layers=(16, 32, 64, 128, 256),
        roi_size_list=(100, 65, 40, 25, 10),
        is_roi_list=(False, True, True, True, True),
        dim_input=1, dim_output=2, packed_levels=2, dtype=jnp.bfloat16)
    fwd = make_eval_forward(model)
    roi = (512, 512, args.depth)

    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1,) + roi + (1,), jnp.bfloat16),
                           train=False))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), init)["params"]

    costs = {}
    for b in (1, 2):
        x = jax.ShapeDtypeStruct((b,) + roi + (1,), jnp.bfloat16)
        lowered = jax.jit(fwd).lower(params, x)
        ca = lowered.cost_analysis()
        if ca is None:
            # Some jax versions only expose cost analysis post-compile.
            ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        costs[b] = ca
        keys = sorted(k for k in ca if not k.startswith("utilization"))
        print(f"batch {b}:")
        for k in keys:
            print(f"  {k:28s} {ca[k]:.4g}")

    print("\nratios (batch2 / batch1; linear == 2.0):")
    for k in sorted(costs[1]):
        if k.startswith("utilization"):
            continue
        v1, v2 = costs[1].get(k, 0.0), costs[2].get(k, 0.0)
        if v1:
            print(f"  {k:28s} {v2 / v1:6.3f}")


if __name__ == "__main__":
    main()

# Measured (CPU HLO, 2026-08-18): batch2/batch1 flops ratio 2.001 (linear,
# model math exonerated), transcendentals 1.999, but bytes-accessed-for-
# outputs 3.559x (19.7 GB -> 70.2 GB total, i.e. +78% traffic per window):
# fusion breaks at batch 2 and materialises intermediates. TPU attribution:
# queue-3 job 26 xplane trace.
