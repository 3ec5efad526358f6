import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from semantic_slam_mapping_tpu.config import SegNetConfig
from semantic_slam_mapping_tpu.models import segnet

CFG = SegNetConfig(input_height=64, input_width=96, num_classes=12)


@pytest.fixture(scope="module")
def model_and_vars():
    return segnet.create(CFG, seed=0)


def test_pool_unpool_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    pooled, onehot = segnet.max_pool_with_indices(x)
    assert pooled.shape == (2, 4, 4, 4)
    assert onehot.shape == (2, 4, 4, 4, 4)
    # exactly one index per window
    np.testing.assert_allclose(np.asarray(onehot.sum(3)), 1.0)
    up = segnet.max_unpool(pooled, onehot)
    assert up.shape == x.shape
    # unpooled equals x at the max positions, 0 elsewhere
    mask = np.asarray(up) != 0
    np.testing.assert_allclose(np.asarray(up)[mask],
                               np.asarray(x)[mask], rtol=1e-6)
    assert mask.reshape(2, 4, 2, 4, 2, 4).sum() <= 2 * 4 * 4 * 4


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 96, 3))
    labels = segnet.infer(model, variables, x)
    assert labels.shape == (2, 64, 96)
    assert labels.dtype == jnp.int32
    assert int(labels.max()) < CFG.num_classes


def test_train_step_reduces_loss(model_and_vars):
    model, variables = model_and_vars
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(segnet.make_train_step(model, opt))

    # trivial task: left half class 4, right half class 1, tied to input
    x = jnp.zeros((2, 64, 96, 3)).at[:, :, 48:, 0].set(1.0)
    y = jnp.full((2, 64, 96), 4, jnp.int32).at[:, :, 48:].set(1)

    losses = []
    for _ in range(8):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_infer_batch_parallel_shapes(model_and_vars):
    """DP over frames: vmap/batched inference matches single-frame."""
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 64, 96, 3))
    # at random init the logits are near-degenerate, so compare the logits
    # themselves (argmax would be tie-breaking noise)
    lb = model.apply(variables, x, train=False)
    ls = model.apply(variables, x[1:2], train=False)
    scale = float(np.abs(np.asarray(ls)).max()) + 1e-9
    diff = float(np.abs(np.asarray(lb[1] - ls[0])).max())
    assert diff < 0.05 * scale + 1e-6, (diff, scale)


SHIPPED = (__import__("pathlib").Path(__file__).parent.parent
           / "semantic_slam_mapping_tpu" / "models" / "weights"
           / "segnet.pkl")


@pytest.mark.skipif(not SHIPPED.exists(), reason="no shipped checkpoint")
def test_shipped_checkpoint_quality():
    """The committed synthetic-world checkpoint must carry a measured
    holdout mIoU and reproduce sane labels (VERDICT r1 item 7)."""
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.config import CameraConfig
    from semantic_slam_mapping_tpu.io import synthetic

    model, variables, meta = segnet.load_checkpoint(SHIPPED)
    assert meta.get("miou", 0.0) > 0.5, meta
    h = w = 96
    K = Intrinsics.from_config(
        CameraConfig(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2))
    world = synthetic.make_world(jax.random.PRNGKey(321), n_boxes=8)
    img, _, sem, _ = synthetic.render(
        K, jnp.eye(4), world, h, w)
    x = jnp.stack([img] * 3, -1)[None]
    pred = segnet.infer(model, variables, x)[0]
    m = float(segnet.miou(pred, sem, 12))
    # cross-resolution inference (trained at 192): still far above chance
    assert m > 0.4, m


@pytest.mark.skipif(not SHIPPED.exists(), reason="no shipped checkpoint")
def test_learned_labels_filter_pedestrian_from_map(tmp_path):
    """VERDICT r1 item 7 'done' condition: a pedestrian-class box is removed
    from the dense map by LEARNED labels (online SegNet, no GT semantics and
    no GT moving mask help — the box is static so UV-disparity cannot mask
    it; only the semantic motion fuse can, mapper.cpp:189-216)."""
    import dataclasses

    from semantic_slam_mapping_tpu.config import default_config, CameraConfig
    from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
    from semantic_slam_mapping_tpu.io import synthetic
    from semantic_slam_mapping_tpu.mapping import semantics
    from semantic_slam_mapping_tpu.pipeline import SlamSystem

    H, W = 96, 256
    cam = CameraConfig(fx=200.0, fy=200.0, cx=W / 2, cy=H / 2, baseline=0.54)
    base = default_config()
    # native /32-aligned inference resolution: anisotropic resizing to the
    # training square would distort object aspect and cost recall. Dilation
    # is bumped to 4 sweeps at this small resolution (the default 2 matches
    # the reference's 360x480 operating point, mapper.cpp:189-216) to close
    # the learned mask over the legs/road boundary.
    cfg = dataclasses.replace(
        base, camera=cam,
        mapper=dataclasses.replace(base.mapper, dilate_iters=4),
        segnet=dataclasses.replace(base.segnet, online=True,
                                   weights=str(SHIPPED),
                                   input_height=H, input_width=W))

    # world: buildings + one STATIC pedestrian-shaped box (0.6 x 1.8 x
    # 0.6 m, the training-world pedestrian geometry) mid-corridor
    key = jax.random.PRNGKey(5)
    w0 = synthetic.make_world(key, n_boxes=8)
    ground = w0.ground_y
    pmin = jnp.array([[0.7, ground - 1.8, 7.7]])
    pmax = jnp.array([[1.3, ground + 0.01, 8.3]])
    world = synthetic.World(
        boxes=jnp.concatenate([w0.boxes, jnp.stack([pmin, pmax], 1)], 0),
        box_class=jnp.concatenate(
            [w0.box_class,
             jnp.array([synthetic.CLASS_PEDESTRIAN], jnp.int32)]),
        ground_y=w0.ground_y, backdrop_z=w0.backdrop_z, box_velocity=None)

    K = Intrinsics.from_config(cam)
    poses = synthetic.straight_trajectory(6, speed=0.3)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    assert int((np.asarray(seq["semantic"])
                == synthetic.CLASS_PEDESTRIAN).sum()) > 200

    def run(use_segnet):
        c = cfg if use_segnet else dataclasses.replace(
            cfg, segnet=dataclasses.replace(cfg.segnet, online=False))
        s = SlamSystem(c, enable_mapping=True)
        for i in range(6):
            g = (np.clip(np.asarray(seq["left"][i]), 0, 1)
                 * 255).astype(np.uint8)
            s.process_frame(seq["left"][i], seq["right"][i],
                            color=np.stack([g] * 3, -1), semantic=None)
        # drain the deferred keyframe-epoch work (cloud generation + map
        # insert harvest at the NEXT epoch or at finish) before reading
        # the map — the same contract golden.py/cli/checkpoint follow
        s.finish()
        return s

    sys_ = run(use_segnet=True)
    ctrl = run(use_segnet=False)   # no semantics at all -> ped enters map
    assert len(sys_.map) > 100 and len(ctrl.map) > 100

    def ped_voxels(m):
        xyz, _, _ = m.as_arrays()
        inside = ((xyz[:, 0] > 0.55) & (xyz[:, 0] < 1.45)
                  & (xyz[:, 2] > 7.55) & (xyz[:, 2] < 8.45)
                  & (xyz[:, 1] < float(ground) - 0.15))
        return int(inside.sum())

    # 1) the learned segmenter found the pedestrian on the keyframes
    kf_sem = [k.semantic for k in sys_.keyframes if k.semantic is not None]
    assert kf_sem and any(
        (np.asarray(s) == synthetic.CLASS_PEDESTRIAN).sum() > 50
        for s in kf_sem)
    # 2) no pedestrian-labeled voxels survive the semantic motion fuse
    _, _, lbl = sys_.map.as_arrays()
    assert int((lbl == semantics.PEDESTRIAN).sum()) == 0
    # 3) learned labels remove (almost all of) the pedestrian's body that
    # the no-semantics control happily maps
    n_ctrl, n_learned = ped_voxels(ctrl.map), ped_voxels(sys_.map)
    assert n_ctrl > 30, n_ctrl
    assert n_learned < 0.2 * n_ctrl, (n_learned, n_ctrl)
