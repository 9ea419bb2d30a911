"""Device mesh + sharding rules.

Replaces the reference's DDP/NCCL plumbing (SURVEY.md §2.10: DDP is its only
parallelism) with a `jax.sharding.Mesh`. Axes:

- ``dp``: data parallel — batch dimension sharded, params replicated. The
  reference's grad all-reduce, `reduce_mean` loss normalizers and BN
  broadcast all become implicit XLA collectives over ICI.
- ``sp``: BEV-spatial parallel (optional, >1 only for very large grids) —
  shards the BEV query dimension of activations; XLA inserts the halo/
  all-gather traffic. Kept at 1 in current configs; the axis exists so the
  multichip dry-run exercises a 2-axis mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, sp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, (dp, sp, n)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch):
    """Apply batch sharding to every leaf (leading dim = global batch)."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
