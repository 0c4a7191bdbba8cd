"""Device mesh + data-parallel sharding rules.

The reference's entire distribution story is single-process
``nn.DataParallel`` (train3D.py:119) — replicate the model, scatter the
batch, gather outputs over NCCL. The TPU-native equivalent is SPMD: one
``jax.sharding.Mesh`` over the chips, parameters replicated, the batch dim
sharded over the ``data`` axis, and XLA inserting the gradient psum over ICI
automatically. No explicit collectives are needed for DP — the sharding
annotations on jit are the whole "communication backend".

Scaling beyond DP is trivial for this model family if ever needed: the
linear-attention context matrix is (d x d), so sequence sharding would only
psum the phi(K)^T V partials (SURVEY.md section 5.7) — noted, not required
for parity with the reference's capability set.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1D data-parallel mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimiser state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host array batch onto the mesh, sharded along dim 0."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def data_parallel_jit(fn, mesh: Mesh, batch_argnums: Sequence[int],
                      donate_argnums: Sequence[int] = ()):
    """jit ``fn`` with batch args sharded over the mesh, the rest replicated.

    XLA turns the parameter-gradient reduction into a psum over ICI; for
    inference the gather back to host is the only cross-chip traffic.
    """
    import inspect

    n_args = len(inspect.signature(fn).parameters)
    in_shardings = tuple(
        batch_sharding(mesh) if i in set(batch_argnums) else replicate(mesh)
        for i in range(n_args))
    return jax.jit(fn, in_shardings=in_shardings,
                   donate_argnums=tuple(donate_argnums))
