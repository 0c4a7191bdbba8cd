"""Micro-probe: why do the IN stat passes run ~10x over the traffic floor?

The round-3/4 eval traces clock ~11.5 ms/window of [C]-output reduce
fusions (docs/DESIGN.md round-4 ledger) against a ~1.8 ms bandwidth floor
(one bf16 read of every normalised activation). Hypothesis: the shipping
``moment_stats`` reduces over a SPLIT LANE dim — group_instance_norm_folded
reshapes lanes (4C) -> (C, 4) and reduces the minor sub-lane axis together
with the majors, which forces cross-lane work on the full tensor. A
formulation that reduces ONLY major dims into per-lane (n, L) sums and
then group-sums the tiny 128-wide result should stream at bandwidth.

Variants (each returns per-group (mean, rstd), f32, identical math):
  cur    — shipping moment_stats on the 7D split-lane view
  lane   — major-dim-only reduce to (n, L) lane sums, tiny lane regroup
  dot    — the refuted MXU Gram contraction (LINTRANSUNET_IN_STATS=dot)
  pallas — single-pass Pallas kernel: per-row-block partial sum/sumsq

Run: python experiments/in_stats_probe.py [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _finish(gsum, gsq, count, eps=EPS):
    mean = gsum / count
    var = jnp.maximum(gsq / count - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _group(sums, n, channels, sub):
    # (n, L) lane sums -> (n, channels); sub = lane split with the channel
    # axis position marked as -1, e.g. (2, -1, 4) for paired.
    shape = tuple(channels if s == -1 else s for s in sub)
    axes = tuple(i + 1 for i, s in enumerate(sub) if s != -1)
    return sums.reshape((n,) + shape).sum(axes)


def stats_cur(x, channels, n, sub, scale=1.0):
    # shipping formulation: split-lane 7D view, one reduce over majors+sublanes
    nd, h, w, l = x.shape
    shape = tuple(channels if s == -1 else s for s in sub)
    x32 = (x.astype(jnp.float32) * scale).reshape((n, nd // n, h, w) + shape)
    axes = (1, 2, 3) + tuple(4 + i for i, s in enumerate(sub) if s != -1)
    mean = jnp.mean(x32, axis=axes)
    meansq = jnp.mean(jnp.square(x32), axis=axes)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + EPS)


def stats_lane(x, channels, n, sub, scale=1.0):
    nd, h, w, l = x.shape
    x32 = (x.astype(jnp.float32) * scale).reshape(n, nd // n, h, w, l)
    sums = jnp.sum(x32, axis=(1, 2, 3))
    sqs = jnp.sum(jnp.square(x32), axis=(1, 2, 3))
    count = (nd // n) * h * w * (l // channels)
    return _finish(_group(sums, n, channels, sub),
                   _group(sqs, n, channels, sub), count)


def stats_dot(x, channels, n, sub, scale=1.0):
    from lintransunet_tpu.ops.packed_conv import _mxu_group_stats
    nd, h, w, l = x.shape
    xr = (x * jnp.bfloat16(scale)).reshape(n, (nd // n) * h * w, l)
    return _mxu_group_stats(xr, lambda s: _group(s, n, channels, sub),
                            (nd // n) * h * w * (l // channels), EPS)


def _pallas_lane_sums(x, scale=1.0, hblk=8):
    """(ND, H, W, L) bf16 -> (ND, H//hblk, 2, L) f32 partial (sum, sumsq)."""
    nd, h, w, l = x.shape
    assert h % hblk == 0 and l % 128 == 0

    def kernel(x_ref, o_ref):
        xb = x_ref[...].astype(jnp.float32) * scale  # (1, hblk, W, L)
        s = jnp.sum(xb, axis=(0, 1, 2))              # (L,)
        q = jnp.sum(jnp.square(xb), axis=(0, 1, 2))
        o_ref[...] = jnp.stack([s, q])[None, None]

    return pl.pallas_call(
        kernel,
        grid=(nd, h // hblk),
        in_specs=[pl.BlockSpec((1, hblk, w, l), lambda i, j: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, l), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nd, h // hblk, 2, l), jnp.float32),
    )(x)


def stats_pallas(x, channels, n, sub, scale=1.0):
    nd, h, w, l = x.shape
    parts = _pallas_lane_sums(x, scale)               # (ND, H/blk, 2, L)
    parts = parts.reshape(n, -1, 2, l).sum(1)         # (n, 2, L)
    count = (nd // n) * h * w * (l // channels)
    return _finish(_group(parts[:, 0], n, channels, sub),
                   _group(parts[:, 1], n, channels, sub), count)


VARIANTS = {"cur": stats_cur, "lane": stats_lane, "dot": stats_dot,
            "pallas": stats_pallas}

SHAPES = [
    # (label, shape, channels, n_volumes, lane split w/ channel at -1)
    ("L0dec-paired", (32, 128, 128, 256), 32, 1, (2, -1, 4)),
    ("L0-paired", (32, 128, 128, 128), 16, 1, (2, -1, 4)),
    ("L1-folded", (64, 64, 64, 128), 32, 1, (-1, 4)),
    ("L1dec-folded", (64, 64, 64, 256), 64, 1, (-1, 4)),
]


def main():
    # The axon tunnel costs ~23 ms per dispatch round-trip, so each timed
    # call processes T INDEPENDENT copies (different data — no CSE) and the
    # per-tensor time is (call - empty-call baseline) / T.
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    def timed(f, *args):
        # ONE executable runs the whole repeat loop on-device (per-rep input
        # perturbations defeat CSE; summed outputs defeat DCE) — host-side
        # per-dispatch timing through the tunnel is unreliable (~23 ms sync
        # RTT, and dropped-output dispatches appear to be elided)
        jax.block_until_ready(f(*args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best * 1e3

    for label, shape, ch, n, sub in SHAPES:
        xs = [jnp.asarray(rng.standard_normal(shape) * 3 + 1, jnp.bfloat16)
              for _ in range(T)]
        nbytes = np.prod(shape) * 2
        floor_ms = nbytes / 819e9 * 1e3  # v5e HBM ~819 GB/s
        print(f"\n{label} {shape}: {nbytes / 1e6:.0f} MB, "
              f"BW floor {floor_ms:.3f} ms", flush=True)
        ref = None
        for name, fn in VARIANTS.items():
            def run(xs, fn=fn):
                acc = jnp.zeros((), jnp.float32)
                for rep in range(iters):
                    for x in xs:
                        m, r = fn(x, ch, n, sub, scale=1.0 + rep * 1e-3)
                        acc += jnp.sum(m) + jnp.sum(r)
                return acc
            f = jax.jit(run)
            out = float(jax.block_until_ready(f(xs)))
            if ref is None:
                ref = out
            else:
                assert abs(out - ref) < 1e-2 * abs(ref) + 1e-3, (name, out, ref)
            call_ms = timed(f, xs)
            ms = call_ms / (T * iters)
            print(f"  {name:8s} {ms:7.3f} ms  ({ms / floor_ms:5.1f}x floor)",
                  flush=True)


if __name__ == "__main__":
    main()
