"""Mesh and sharding layer — the framework's communication backend.

The reference has NO distributed anything: its "comm layer" is three
threads + mutexes in one process (SURVEY.md §2.3). This module is the
first-class replacement required by the north star: a `jax.sharding.Mesh`
with a data axis (frame/batch/edge parallelism) and a model axis (channel
parallelism for SegNet), with XLA inserting the collectives (`psum`,
`all_gather`) that ride ICI.

Sharding map:
- SegNet training/inference: batch over 'data', conv output channels over
  'model' (tensor parallelism for the widest layers).
- Pose-graph PCG: edges over 'data' (residual/Jacobian work), vertex state
  replicated, scatter-add reductions become psums (see sharded_pcg).
- BoW scoring + map fusion: keyframe/voxel-block axes over 'data'.

Pipeline/expert/sequence parallelism are documented non-goals for this
workload (no transformer, no MoE — SURVEY.md §2.3, §5 long-context row).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: `jax.distributed.initialize` with TPU-pod
    auto-detection when no arguments are given (the framework's answer to
    the reference's single-process assumption — SURVEY.md §2.3). Returns
    the global device count. Safe to call when already initialized or on a
    single host (no-op)."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator, num_processes,
                                       process_id)
        elif num_processes is not None or process_id is not None:
            jax.distributed.initialize(num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh over the first dp*tp visible devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if dp is None and tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp <= len(devs), (dp, tp, len(devs))
    arr = np.array(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _spec_for_param(path: str, x: Any, tp: int) -> P:
    """Channel-parallel spec for SegNet params: conv kernels (3,3,cin,cout)
    shard cout over 'model' when divisible; everything else replicated."""
    shape = getattr(x, "shape", ())
    if len(shape) == 4 and shape[-1] % tp == 0 and shape[-1] >= 2 * tp:
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= 64 * tp:
        return P(MODEL_AXIS)
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Apply tensor-parallel NamedShardings to a SegNet param tree."""
    tp = mesh.shape[MODEL_AXIS]

    def place(x):
        spec = _spec_for_param("", x, tp)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _spec_for_param("", x, tp)), params)
