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


@pytest.mark.slow
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


@pytest.fixture(scope="module")
def tum_dataset(tmp_path_factory):
    """An on-disk TUM-format RGB-D dataset (associate.txt + 16-bit depth
    PNGs + groundtruth.txt) rendered from the synthetic world."""
    root = tmp_path_factory.mktemp("tum_seq")
    K = Intrinsics.from_config(CAM)
    world = synthetic.make_world(jax.random.PRNGKey(71), n_boxes=14)
    poses = synthetic.straight_trajectory(5, speed=0.4)
    seq = synthetic.render_sequence(K, world, poses, H, W)
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    assoc, gt_lines = [], []
    for i in range(5):
        t = 1000.0 + 0.1 * i
        L = (np.asarray(seq["left"][i]) * 255).astype(np.uint8)
        Image.fromarray(np.stack([L] * 3, -1), "RGB").save(
            root / "rgb" / f"{t:.6f}.png")
        d16 = (np.asarray(seq["depth"][i]) * 1000.0).astype(np.uint16)
        Image.fromarray(d16).save(root / "depth" / f"{t:.6f}.png")
        assoc.append(f"{t:.6f} rgb/{t:.6f}.png {t:.6f} depth/{t:.6f}.png")
        T = np.asarray(seq["poses"][i])
        # rotation -> quaternion (w last, TUM order qx qy qz qw)
        R = T[:3, :3]
        qw = 0.5 * np.sqrt(max(1.0 + np.trace(R), 1e-12))
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        gt_lines.append(f"{t:.6f} {T[0,3]} {T[1,3]} {T[2,3]} "
                        f"{qx} {qy} {qz} {qw}")
    (root / "associate.txt").write_text("\n".join(assoc) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return root


def test_cli_rgbd_tum(tum_dataset, tmp_path, capsys):
    out = tmp_path / "out"
    cli.main(["rgbd", "--data", str(tum_dataset),
              "--gt", str(tum_dataset / "groundtruth.txt"),
              "--out", str(out), "--plot",
              "--fx", str(CAM.fx), "--fy", str(CAM.fy),
              "--cx", str(CAM.cx), "--cy", str(CAM.cy),
              "--depth-scale", "1000"])
    captured = capsys.readouterr()
    assert (out / "trajectory.txt").exists()
    assert (out / "trajectory.png").exists()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert report["frames"] == 5
    assert report["ate_rmse_m"] < 0.5


@pytest.mark.slow
def test_cli_pnp_kitti(kitti_dataset, tmp_path, capsys):
    root, gt_file, params = kitti_dataset
    out = tmp_path / "out"
    cli.main(["pnp", "--data", str(root), "--gt", str(gt_file),
              "--parameters", str(params), "--out", str(out), "--plot"])
    captured = capsys.readouterr()
    assert (out / "trajectory.txt").exists()
    assert (out / "trajectory.png").exists()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert report["frames"] == 6
    assert report["ate_rmse_m"] < 1.0


def test_cli_read_frames(kitti_dataset, tmp_path, capsys):
    root, _, _ = kitti_dataset
    out = tmp_path / "dump"
    cli.main(["read-frames", "--data", str(root), "--out", str(out),
              "--frames", "3", "--dump", "2"])
    captured = capsys.readouterr()
    assert "frame 0" in captured.out
    assert (out / "000000_left.png").exists()
    assert (out / "000001_left.png").exists()


def test_cli_match_orb(tum_dataset, tmp_path, capsys):
    out = tmp_path / "orb"
    cli.main(["match-orb", "--data", str(tum_dataset), "--dataset", "tum",
              "--frames", "3", "--dump", "1", "--out", str(out)])
    captured = capsys.readouterr()
    lines = [l for l in captured.out.splitlines() if "matches" in l]
    assert len(lines) == 2
    assert all(int(l.split("matches")[0].split(",")[-1].strip()) >= 0
               for l in lines)
    # orbcreate.cpp role: keypoint-overlay PNG written
    assert (out / "000000_orb.png").exists()
