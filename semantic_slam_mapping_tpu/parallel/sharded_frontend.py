"""Multi-chip frontend: the per-frame hot loop sharded over the mesh.

The reference's frontend is strictly serial on one CPU core per stage
(SURVEY.md §3.1); round 1 gave it single-device batch parallelism
(tracker.track_frames_batched). This module is the missing multi-device
form (VERDICT r1 item 4): the window's frame-pair axis is sharded over the
mesh 'data' axis with `shard_map`, so n chips each run SGBM + quad matching
+ RANSAC VO + U-V-disparity on B/n pairs of the window.

Communication analysis (why this scales): the only cross-pair dependencies
are the two tiny sequential recurrences — the pitch Kalman filter and the
pose-integration chain. Both consume per-pair *scalars/4x4s* (pitch
measurement, T_delta, success), so the collective traffic per window is one
all_gather of O(B) floats + one of O(B) 4x4s — a few KB against ~100 MB of
per-pair image compute. Expected scaling efficiency is compute-bound ≈ 1;
`bench.py --scaling` measures the all-gather fraction from the compiled
HLO's cost analysis and the virtual-mesh equivalence test pins correctness
(tests/test_sharded_frontend.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
try:                        # jax >= 0.8 top-level API (check_vma kwarg)
    from jax import shard_map as _shard_map
    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:         # older jax (check_rep kwarg)
    from jax.experimental.shard_map import shard_map as _shard_map
    _SHARD_MAP_KW = {"check_rep": False}
from jax.sharding import NamedSharding, PartitionSpec as P

from semantic_slam_mapping_tpu.config import SlamConfig
from semantic_slam_mapping_tpu.frontend import tracker
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.parallel.mesh import DATA_AXIS


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def track_frames_sharded(state: tracker.TrackerState,
                         lefts: jnp.ndarray, rights: jnp.ndarray,
                         K: Intrinsics, key: jax.Array,
                         cfg: SlamConfig, mesh
                         ) -> Tuple[tracker.TrackerState,
                                    tracker.FrameResult]:
    """track_frames_batched over a device mesh.

    lefts/rights: (B+1, H, W); B must divide by mesh.shape['data']. The
    returned FrameResult's per-pair image fields (disparity, moving_mask,
    matches, ...) come back sharded over 'data'; pose/status (the full
    window chain) and the TrackerState are replicated.
    """
    n = mesh.shape[DATA_AXIS]
    B = lefts.shape[0] - 1
    assert B % n == 0, f"window {B} not divisible by data axis {n}"

    cur_l, cur_r = lefts[1:], rights[1:]
    prev_l, prev_r = lefts[:-1], rights[:-1]
    keys = jax.random.split(key, B)

    shard = P(DATA_AXIS)
    repl = P()
    # per-pair outputs are sharded; window-chain outputs + state replicated
    out_specs = (
        jax.tree_util.tree_map(lambda _: repl, state),
        tracker.FrameResult(
            pose=repl, T_delta=shard, status=repl, n_matches=shard,
            n_inliers=shard,
            moving_mask=shard, disparity=shard,
            matches=_matches_spec(),
            vo_success=shard, pitch=shard))

    fn = _shard_map(
        lambda st, cl, cr, pl, pr, k: tracker.window_core(
            st, cl, cr, pl, pr, K, k, cfg, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: repl, state),
                  shard, shard, shard, shard, shard),
        out_specs=out_specs,
        **_SHARD_MAP_KW)
    new_state, out = fn(state, cur_l, cur_r, prev_l, prev_r, keys)
    return new_state, out


def _matches_spec():
    """A QuadMatches-shaped pytree of P(DATA_AXIS) specs."""
    from semantic_slam_mapping_tpu.frontend import vo
    fields = vo.QuadMatches._fields
    return vo.QuadMatches(**{f: P(DATA_AXIS) for f in fields})


def batch_shardings(mesh):
    """NamedShardings for placing window inputs before the call (optional —
    jit will reshard as needed, but placing inputs sharded avoids a
    broadcast of the full frame window to every device)."""
    return NamedSharding(mesh, P(DATA_AXIS))
