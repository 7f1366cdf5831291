"""Device mesh + sharding helpers (DP over ICI, optional TP).

Net-new capability relative to the reference, which is single-device
(`/root/reference/src/denoising_utils.py:14`; SURVEY.md §2.5). The design
follows the standard JAX SPMD recipe: build a `Mesh` over the slice, annotate
batch/parameter shardings with `NamedSharding`, and let XLA's GSPMD insert
the collectives (gradient psums ride the ICI ring).

Axes:
  'slice' — OPTIONAL leading multislice axis (SURVEY §2.5): data parallelism
         ACROSS TPU slices, whose collectives ride DCN rather than ICI. Only
         the once-per-step gradient all-reduce crosses it (DP tolerates DCN
         latency); 'tp'/'sp' collectives stay inside a slice on ICI. On real
         multislice jobs devices are grouped by their `slice_index` so the
         mesh's leading axis coincides with the physical slice boundary;
         elsewhere (single slice, CPU virtual devices) contiguous blocks
         stand in and the axis is exercised symbolically.
  'dp' — data parallel within a slice: batch dimension of train/sample/eval
         steps.
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


def make_mesh(dp: Optional[int] = None, tp: int = 1, n_slices: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh — or (slice, dp, tp) when ``n_slices > 1`` —
    over the available devices. ``dp`` defaults to the per-slice device
    count // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_slices > 1:
        if n % n_slices:
            raise ValueError(f"{n} devices not divisible by {n_slices} slices")
        per_slice = n // n_slices
        if dp is None:
            dp = per_slice // tp
        if dp * tp != per_slice:
            raise ValueError(
                f"dp*tp = {dp}*{tp} != {per_slice} devices per slice"
            )
        # real multislice: group by the device's physical slice so the
        # leading mesh axis (and its DCN collectives) match the hardware
        devices = sorted(
            devices, key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id)
        )
        arr = np.asarray(devices).reshape(n_slices, dp, tp)
        return Mesh(arr, axis_names=("slice", "dp", "tp"))
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension is split over: ('slice', 'dp') on a
    multislice mesh, ('dp',) otherwise."""
    return ("slice", "dp") if "slice" in mesh.axis_names else ("dp",)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes, replicate the
    rest."""
    return NamedSharding(mesh, P(data_axes(mesh)))


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
