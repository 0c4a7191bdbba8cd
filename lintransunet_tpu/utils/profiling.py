"""Profiling hooks: jax.profiler traces + host-synced wall-clock timing.

The reference has no profiling (SURVEY.md section 5.1). These wrappers give
the two tools that matter on TPU:

* ``profile_trace(dir)`` — context manager around ``jax.profiler.trace``
  producing a TensorBoard-loadable trace (device op timeline);
* ``timed(fn)`` — wall-clock timing that forces a host sync through a
  scalar read. NOTE: ``jax.block_until_ready`` is NOT reliable through the
  axon remote tunnel; a host transfer is the only trustworthy barrier
  (learned the hard way — see .claude/skills/verify/SKILL.md).
"""

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def _sync(value) -> None:
    leaves = jax.tree.leaves(value)
    if leaves:
        jnp.asarray(leaves[0]).ravel()[0].item()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Returns (best_seconds, last_result) with forced host syncs."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        _sync(result)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        _sync(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
