import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from semantic_slam_mapping_tpu.backend import pose_graph as pg
from semantic_slam_mapping_tpu.config import PoseGraphConfig, SegNetConfig
from semantic_slam_mapping_tpu.models import segnet
from semantic_slam_mapping_tpu.parallel import mesh as pmesh
from semantic_slam_mapping_tpu.parallel import sharded_pcg

from tests.test_pose_graph import build_chain, pose_err

CFG = PoseGraphConfig(pcg_iters=16)


def test_mesh_shapes():
    m = pmesh.make_mesh(8)
    assert m.shape[pmesh.DATA_AXIS] * m.shape[pmesh.MODEL_AXIS] == 8
    m2 = pmesh.make_mesh(8, dp=4, tp=2)
    assert m2.shape[pmesh.DATA_AXIS] == 4


def test_sharded_pcg_matches_single_device():
    g, gt, n = build_chain(jax.random.PRNGKey(1), 16, drift=0.03, loop=True)
    mask = pg.global_free_mask(g)
    ref = pg.optimize(g, mask, CFG, iters=2)

    m = pmesh.make_mesh(8, dp=8, tp=1)
    out = sharded_pcg.optimize_sharded(g, mask, m, CFG, iters=2)
    # same optimization result across the 8-way edge sharding
    assert pose_err(out.poses[:n], ref.poses[:n]) < 5e-3


def test_sharded_segnet_train_step():
    """dp x tp sharded SegNet train step compiles and runs on the 8-device
    CPU mesh; loss finite, params sharded over the model axis."""
    cfg = SegNetConfig(input_height=32, input_width=32)
    model, variables = segnet.create(cfg, seed=0)
    m = pmesh.make_mesh(8, dp=4, tp=2)
    params = pmesh.shard_params(variables["params"], m)
    bs = jax.device_put(variables["batch_stats"], pmesh.replicated(m))
    opt = optax.sgd(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(segnet.make_train_step(model, opt))

    x = jax.device_put(jnp.zeros((8, 32, 32, 3)), pmesh.batch_sharding(m))
    y = jax.device_put(jnp.zeros((8, 32, 32), jnp.int32),
                       pmesh.batch_sharding(m))
    params, bs, opt_state, loss = step(params, bs, opt_state, x, y)
    assert np.isfinite(float(loss))
    # at least one large conv kernel actually sharded over 'model'
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda p: p.sharding.spec, params,
                               is_leaf=lambda x: hasattr(x, "sharding")))
    assert any(pmesh.MODEL_AXIS in str(s) for s in shardings)
