import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_mapping_tpu.backend import looper
from semantic_slam_mapping_tpu.config import CameraConfig, OrbConfig
from semantic_slam_mapping_tpu.geometry import se3
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.ops import orb

H, W = 120, 320
ORB_CFG = OrbConfig(n_features=256, n_levels=4)


@pytest.fixture(scope="module")
def vocab_and_frames():
    """Build a small vocabulary from descriptors of several synthetic views,
    then produce BoW vectors for: two views of the SAME place and one view
    of a DIFFERENT place."""
    K = Intrinsics.from_config(CameraConfig(
        fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, baseline=0.54))
    worldA = synthetic.make_world(jax.random.PRNGKey(1), n_boxes=12)
    worldB = synthetic.make_world(jax.random.PRNGKey(7), n_boxes=12)

    def feats(world, pose):
        img, _, _, _ = synthetic.render(K, pose, world, H, W)
        return orb.extract(img, ORB_CFG)

    fA0 = feats(worldA, se3.identity())
    fA1 = feats(worldA, se3.exp(jnp.array([0.05, 0.0, 0.2, 0.0, 0.01, 0.0])))
    fB = feats(worldB, se3.exp(jnp.array([3.0, 0.0, 20.0, 0.0, 0.6, 0.0])))

    train = np.concatenate([np.asarray(fA0.desc[fA0.valid]),
                            np.asarray(fB.desc[fB.valid])])
    vocab = looper.build_vocabulary(train, branching=6, depth=3, seed=0)
    return vocab, fA0, fA1, fB


def test_vocab_shapes(vocab_and_frames):
    vocab, *_ = vocab_and_frames
    assert vocab.branching == 6
    assert vocab.n_leaves == 6 ** 3
    assert vocab.centers[1].shape == (36, 256)


def test_bow_normalized(vocab_and_frames):
    vocab, fA0, *_ = vocab_and_frames
    v = looper.transform(vocab, fA0.desc, fA0.valid)
    assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-5


def test_same_place_scores_higher(vocab_and_frames):
    vocab, fA0, fA1, fB = vocab_and_frames
    v0 = looper.transform(vocab, fA0.desc, fA0.valid)
    v1 = looper.transform(vocab, fA1.desc, fA1.valid)
    vb = looper.transform(vocab, fB.desc, fB.valid)
    s_same = float(looper.l1_score(v0, v1))
    s_diff = float(looper.l1_score(v0, vb))
    assert s_same > s_diff + 0.05, (s_same, s_diff)
    assert float(looper.l1_score(v0, v0)) > 0.999


def test_get_possible_loops_gates(vocab_and_frames):
    vocab, fA0, fA1, fB = vocab_and_frames
    v0 = looper.transform(vocab, fA0.desc, fA0.valid)
    v1 = looper.transform(vocab, fA1.desc, fA1.valid)
    vb = looper.transform(vocab, fB.desc, fB.valid)
    db = jnp.stack([v1, vb, v1])
    ids = jnp.array([10, 50, 95])
    valid = jnp.ones(3, bool)
    scores, mask = looper.get_possible_loops(
        v0, db, ids, valid, jnp.int32(100), min_score=0.015, min_interval=60)
    # id 95 too recent (gap 5 < 60) -> excluded even though score is high
    assert not bool(mask[2])
    # id 10: same place, old enough -> candidate
    assert bool(mask[0])
    assert float(scores[0]) > float(scores[1])


def test_empty_database():
    vocab = looper.build_vocabulary(
        np.random.default_rng(0).integers(0, 2, (500, 256)).astype(np.uint8),
        branching=4, depth=2)
    v = jnp.zeros(vocab.n_leaves).at[0].set(1.0)
    db = jnp.zeros((8, vocab.n_leaves))
    scores, mask = looper.get_possible_loops(
        v, db, jnp.zeros(8, jnp.int32), jnp.zeros(8, bool),
        jnp.int32(100), 0.015, 60)
    assert not bool(mask.any())
