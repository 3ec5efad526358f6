import json
import sys

import jax
import numpy as np
import pytest
from PIL import Image

from semantic_slam_mapping_tpu import cli
from semantic_slam_mapping_tpu.geometry.camera import Intrinsics
from semantic_slam_mapping_tpu.io import synthetic
from semantic_slam_mapping_tpu.io.gt_pose import write_kitti_poses

from tests.test_pipeline import CAM, CFG, H, W


@pytest.fixture(scope="module")
def kitti_dataset(tmp_path_factory):
    """A real on-disk KITTI-format dataset rendered from the synthetic
    world, with GT poses."""
    root = tmp_path_factory.mktemp("kitti_seq")
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(70), n_boxes=14)
    poses = synthetic.straight_trajectory(6, speed=0.5)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    for sub in ("image_0", "image_1", "image_2"):
        (root / sub).mkdir()
    for i in range(6):
        L = (np.asarray(seq["left"][i]) * 255).astype(np.uint8)
        R = (np.asarray(seq["right"][i]) * 255).astype(np.uint8)
        Image.fromarray(L, "L").save(root / "image_0" / f"{i:06d}.png")
        Image.fromarray(R, "L").save(root / "image_1" / f"{i:06d}.png")
        Image.fromarray(np.stack([L] * 3, -1), "RGB").save(
            root / "image_2" / f"{i:06d}.png")
    gt_file = root / "gt.txt"
    write_kitti_poses(gt_file, np.asarray(seq["poses"]))
    # reference-format parameters.txt pointing at the test camera
    params = root / "parameters.txt"
    params.write_text(
        f"camera.fx={CAM.fx}\ncamera.fy={CAM.fy}\ncamera.cx={CAM.cx}\n"
        f"camera.cy={CAM.cy}\ncamera.baseline={CAM.baseline}\n"
        "start_index=0\nend_index=6\n"
        "keyframe_min_translation=1.2\n")
    return root, gt_file, params


def test_cli_tracker_runs_and_reports_ate(kitti_dataset, tmp_path, capsys):
    root, gt_file, params = kitti_dataset
    out = tmp_path / "out"
    cli.main(["tracker", "--data", str(root), "--gt", str(gt_file),
              "--parameters", str(params), "--out", str(out)])
    captured = capsys.readouterr()
    assert (out / "trajectory.txt").exists()
    assert (out / "traj.g2o").exists()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert report["frames"] == 6
    assert report["ate_rmse_m"] < 1.0


def test_cli_make_vocab(kitti_dataset, tmp_path):
    root, gt_file, params = kitti_dataset
    out = tmp_path / "vocab"
    cli.main(["make-vocab", "--data", str(root), "--out", str(out),
              "--stride", "2", "--branching", "4", "--depth", "2"])
    assert (out / "vocab.npz").exists()
    from semantic_slam_mapping_tpu.backend.looper import load_vocabulary
    v = load_vocabulary(str(out / "vocab.npz"))
    assert v.n_leaves == 16
