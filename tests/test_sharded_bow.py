import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_mapping_tpu.backend import looper
from semantic_slam_mapping_tpu.parallel import mesh as pmesh
from semantic_slam_mapping_tpu.parallel import sharded_bow


def test_sharded_bow_matches_single_device():
    rng = np.random.default_rng(0)
    M, L = 64, 128
    db = rng.dirichlet(np.ones(L) * 0.1, size=M).astype(np.float32)
    q = jnp.asarray(db[7] * 0.7 + db[12] * 0.3)
    q = q / jnp.sum(jnp.abs(q))
    ids = jnp.arange(M, dtype=jnp.int32) * 3
    valid = jnp.ones(M, bool)
    qid = jnp.int32(500)

    s_ref, m_ref = looper.get_possible_loops(
        q, jnp.asarray(db), ids, valid, qid, 0.015, 60)

    m = pmesh.make_mesh(8, dp=8, tp=1)
    db_sh = sharded_bow.shard_database(jnp.asarray(db), m)
    s, mask = sharded_bow.get_possible_loops_sharded(
        q, db_sh, ids, valid, qid, m, 0.015, 60)

    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(m_ref))
