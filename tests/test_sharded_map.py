import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.parallel import mesh as pmesh
from semantic_slam_mapping_tpu.parallel import sharded_map as sm

BUDGET = 1 << 12
RES = 0.2
EXT = 8.0


def mesh8():
    return pmesh.make_mesh(8, dp=8, tp=1)


def fuse(m, state, xyz, rgb=None, valid=None, min_support=1):
    n = len(xyz)
    rgb = rgb if rgb is not None else jnp.ones((n, 3)) * 0.5
    valid = valid if valid is not None else jnp.ones(n, bool)
    return sm.fuse_cloud(state, jnp.asarray(xyz, jnp.float32), rgb, valid,
                         m, budget=BUDGET, resolution=RES, x_extent=EXT,
                         min_support=min_support)


def test_points_land_on_owning_shards():
    m = mesh8()
    state = sm.empty_map(m, BUDGET)
    # one dense blob per slab center -> each shard gets its own voxels
    centers = np.linspace(-EXT + 1.0, EXT - 1.0, 8)
    pts = np.concatenate([
        np.stack([np.full(50, c), np.linspace(-1, 1, 50), np.zeros(50)], -1)
        for c in centers])
    state = fuse(m, state, pts)
    per_shard = np.asarray(state.valid).sum(axis=1)
    assert (per_shard > 0).all(), per_shard
    xyz, rgb, _ = sm.gather_map(state)
    assert len(xyz) > 8 * 5


def test_voxel_dedup_across_repeated_fusion():
    m = mesh8()
    state = sm.empty_map(m, BUDGET)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-EXT + 0.5, EXT - 0.5, (500, 3)) * \
        np.array([1.0, 0.2, 0.2])
    state = fuse(m, state, pts)
    n1 = int(np.asarray(state.valid).sum())
    state = fuse(m, state, pts)  # same points again
    n2 = int(np.asarray(state.valid).sum())
    assert n1 > 0
    assert abs(n2 - n1) <= n1 * 0.01  # no duplicate voxels

    # counts accumulate
    assert float(np.asarray(state.count).sum()) > n1


def test_out_of_extent_dropped():
    m = mesh8()
    state = sm.empty_map(m, BUDGET)
    pts = np.array([[100.0, 0.0, 0.0], [0.0, 0.0, 100.0]])
    state = fuse(m, state, pts)
    assert int(np.asarray(state.valid).sum()) == 0


def test_halo_support_across_slab_border():
    """Two adjacent voxels on opposite sides of a slab boundary must
    support each other via the halo exchange: with min_support=1 both
    survive; an isolated far voxel does not."""
    m = mesh8()
    state = sm.empty_map(m, BUDGET)
    slab_w = 2 * EXT / 8
    xb = -EXT + slab_w * 4          # boundary between shard 3 and 4
    eps = RES / 4
    pts = np.array([
        [xb - eps, 0.0, 0.0],       # last voxel column of shard 3
        [xb + eps, 0.0, 0.0],       # first voxel column of shard 4
        [xb + 3 * slab_w / 4, 5.0, 5.0],  # isolated voxel, no neighbors
    ])
    state = fuse(m, state, pts, min_support=1)
    xyz, _, _ = sm.gather_map(state)
    assert len(xyz) == 2, xyz       # the pair survives, the loner dies
    assert np.all(np.abs(xyz[:, 0] - xb) < RES)
