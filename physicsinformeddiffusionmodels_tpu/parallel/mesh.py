"""Device mesh + sharding helpers (DP over ICI, optional TP).

Net-new capability relative to the reference, which is single-device
(`/root/reference/src/denoising_utils.py:14`; SURVEY.md §2.5). The design
follows the standard JAX SPMD recipe: build a `Mesh` over the slice, annotate
batch/parameter shardings with `NamedSharding`, and let XLA's GSPMD insert
the collectives (gradient psums ride the ICI ring).

Axes:
  'dp' — data parallel: batch dimension of train/sample/eval steps.
  'tp' — tensor parallel: output-feature axis of large conv/dense kernels
         (mechanics UNet dim=128 blocks are the target; darcy dim=32 keeps
         tp=1).

When to use 'tp' (compiled-HLO evidence in docs/TP_EVIDENCE.md): tp=2
halves per-device parameter/optimizer/EMA state and peak program memory
for the dim=128 mechanics step, at ~1.5x the collective bytes spread over
~400 ops instead of DP's 2 gradient all-reduces. TP is the memory lever
(bigger models/batches/resolutions per chip); pure DP remains the
throughput default at the reference's shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices. ``dp`` defaults to
    n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: tuple, leaf, tp_size: int, min_size: int = 256) -> P:
    """Tensor-parallel partition rule for a parameter leaf.

    Shards the output-feature (last) axis of conv/dense kernels over 'tp'
    when divisible and large enough; everything else is replicated. With
    tp=1 everything is replicated (pure DP).
    """
    if tp_size <= 1 or leaf.ndim < 2:
        return P()
    last = leaf.shape[-1]
    if last % tp_size == 0 and leaf.size >= min_size * tp_size:
        return P(*((None,) * (leaf.ndim - 1)), "tp")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the TP partition rule to a parameter pytree (replicates all
    leaves when the mesh has tp=1)."""
    tp = mesh.shape["tp"]

    def place(path, leaf):
        spec = param_partition_spec(path, leaf, tp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading axis split over 'dp'."""
    return jax.device_put(batch, batch_sharding(mesh))
