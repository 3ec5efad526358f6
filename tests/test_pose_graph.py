import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.backend import pose_graph as pg
from semantic_slam_mapping_tpu.config import PoseGraphConfig
from semantic_slam_mapping_tpu.geometry import se3

CFG = PoseGraphConfig(pcg_iters=40)
M, E = 64, 128


def build_chain(key, n, drift=0.02, loop=False):
    """Ground-truth circular-ish trajectory; odometry edges with drift noise;
    optional loop edge closing first<->last."""
    gt = [jnp.eye(4)]
    step = se3.exp(jnp.array([0.0, 0.0, 1.0, 0.0, 2 * np.pi / n, 0.0]))
    for i in range(1, n):
        gt.append(se3.compose(gt[-1], step))
    gt = jnp.stack(gt)

    g = pg.PoseGraph.empty(M, E)
    keys = jax.random.split(key, n)
    # odometry measurements = true relative pose + noise
    poses = [gt[0]]
    e_i, e_j, e_T, e_info, e_valid, e_loop = [], [], [], [], [], []
    for i in range(1, n):
        T_rel = se3.compose(se3.inverse(gt[i - 1]), gt[i])
        noise = se3.exp(drift * jax.random.normal(keys[i], (6,))
                        * jnp.array([1, 1, 1, 0.1, 0.1, 0.1]))
        T_meas = se3.compose(T_rel, noise)
        poses.append(se3.compose(poses[-1], T_meas))  # integrated (drifty)
        e_i.append(i - 1)
        e_j.append(i)
        e_T.append(T_meas)
        e_info.append(100.0)
        e_valid.append(True)
        e_loop.append(False)
    if loop:
        T_rel = se3.compose(se3.inverse(gt[0]), gt[n - 1]);
        e_i.append(0); e_j.append(n - 1); e_T.append(T_rel)
        e_info.append(100.0); e_valid.append(True); e_loop.append(True)

    ne = len(e_i)
    g = g._replace(
        poses=g.poses.at[:n].set(jnp.stack(poses)),
        vertex_valid=g.vertex_valid.at[:n].set(True),
        edge_i=g.edge_i.at[:ne].set(jnp.array(e_i, jnp.int32)),
        edge_j=g.edge_j.at[:ne].set(jnp.array(e_j, jnp.int32)),
        edge_T=g.edge_T.at[:ne].set(jnp.stack(e_T)),
        edge_info=g.edge_info.at[:ne].set(jnp.array(e_info)),
        edge_valid=g.edge_valid.at[:ne].set(jnp.array(e_valid)),
        edge_is_loop=g.edge_is_loop.at[:ne].set(jnp.array(e_loop)))
    return g, gt, n


def pose_err(a, b):
    d = se3.compose(se3.inverse(a), b)
    return float(jnp.max(se3.translation_norm(d)))


def test_consistent_graph_stays_put():
    g, gt, n = build_chain(jax.random.PRNGKey(0), 12, drift=0.0)
    out = pg.optimize(g, pg.global_free_mask(g), CFG, iters=3)
    assert pose_err(out.poses[:n], g.poses[:n]) < 1e-3


def test_loop_closure_removes_drift():
    g, gt, n = build_chain(jax.random.PRNGKey(1), 16, drift=0.03, loop=True)
    drift_before = pose_err(g.poses[:n], gt[:n])
    out = pg.optimize(g, pg.global_free_mask(g), CFG, iters=10)
    drift_after = pose_err(out.poses[:n], gt[:n])
    assert drift_after < drift_before * 0.5, (drift_before, drift_after)
    # chi2 decreased
    assert float(pg.edge_chi2(out)[g.edge_valid].sum()) < \
        float(pg.edge_chi2(g)[g.edge_valid].sum())


def test_fixed_vertex_stays():
    g, gt, n = build_chain(jax.random.PRNGKey(2), 10, drift=0.05, loop=True)
    p0 = g.poses[0]
    out = pg.optimize(g, pg.global_free_mask(g), CFG, iters=5)
    np.testing.assert_allclose(np.asarray(out.poses[0]), np.asarray(p0),
                               atol=1e-6)


def test_local_window_only_moves_tail():
    g, gt, n = build_chain(jax.random.PRNGKey(3), 12, drift=0.05)
    mask = pg.local_free_mask(g, jnp.int32(n), window=5)
    out = pg.optimize(g, mask, CFG, iters=5)
    head_before = np.asarray(g.poses[: n - 5])
    head_after = np.asarray(out.poses[: n - 5])
    np.testing.assert_allclose(head_after, head_before, atol=1e-6)


def test_invalid_edges_ignored():
    g, gt, n = build_chain(jax.random.PRNGKey(4), 10, drift=0.0)
    # corrupt an edge but mark invalid
    bad = se3.exp(jnp.array([5.0, 5.0, 5.0, 1.0, 1.0, 1.0]))
    ne = n - 1
    g2 = g._replace(edge_T=g.edge_T.at[ne].set(bad),
                    edge_i=g.edge_i.at[ne].set(0),
                    edge_j=g.edge_j.at[ne].set(n - 1),
                    edge_info=g.edge_info.at[ne].set(100.0),
                    edge_valid=g.edge_valid.at[ne].set(False))
    out = pg.optimize(g2, pg.global_free_mask(g2), CFG, iters=5)
    assert pose_err(out.poses[:n], g.poses[:n]) < 1e-3


def test_huber_softens_bad_edge():
    """A grossly wrong extra edge between two adjacent vertices competes
    with the good odometry edge on the same pair: quadratic loss splits the
    difference (metres of damage); Huber saturates the outlier's pull and
    the good edge wins. (Full rejection of such edges is the PnP/chi2
    gate's job before insertion, pose_graph.cpp:112-137, as in the
    reference.)"""
    g, gt, n = build_chain(jax.random.PRNGKey(5), 14, drift=0.005)
    ne = n - 1
    bad = se3.exp(jnp.array([8.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    g2 = g._replace(edge_T=g.edge_T.at[ne].set(bad),
                    edge_i=g.edge_i.at[ne].set(n - 2),
                    edge_j=g.edge_j.at[ne].set(n - 1),
                    edge_info=g.edge_info.at[ne].set(100.0),
                    edge_valid=g.edge_valid.at[ne].set(True),
                    edge_is_loop=g.edge_is_loop.at[ne].set(True))
    out = pg.optimize(g2, pg.global_free_mask(g2), CFG, iters=10)
    cfg_quad = PoseGraphConfig(pcg_iters=40, huber_delta=1e6)
    out_quad = pg.optimize(g2, pg.global_free_mask(g2), cfg_quad, iters=10)
    e_huber = pose_err(out.poses[:n], g.poses[:n])
    e_quad = pose_err(out_quad.poses[:n], g.poses[:n])
    assert e_quad > 1.0          # quadratic: metres of damage
    assert e_huber < 0.5 * e_quad, (e_huber, e_quad)


def test_local_free_mask_keeps_gauge():
    """An all-free local window would make the relative-edge system
    gauge-free (the solver can drift the whole graph); vertex 0 must stay
    fixed even when n_vertices <= window."""
    import jax.numpy as jnp
    g = pg.PoseGraph.empty(8, 8)
    for n in (1, 2, 4, 5, 8):
        m = np.asarray(pg.local_free_mask(g, jnp.int32(n), 5))
        assert not m[0], f"v0 free at n={n}"
        if n > 1:
            assert m[n - 1]
