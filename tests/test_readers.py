import numpy as np
import pytest
from PIL import Image

from semantic_slam_mapping_tpu.io.gt_pose import (
    read_kitti_poses, read_tum_trajectory, write_kitti_poses)
from semantic_slam_mapping_tpu.io.kitti import KittiReader
from semantic_slam_mapping_tpu.io.tum import TumReader, parse_associate


@pytest.fixture
def kitti_dir(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ["image_0", "image_1", "image_2"]:
        (tmp_path / sub).mkdir()
    for i in range(4):
        g = rng.integers(0, 255, (40, 100), dtype=np.uint8)
        Image.fromarray(g, "L").save(tmp_path / "image_0" / f"{i:06d}.png")
        Image.fromarray(g, "L").save(tmp_path / "image_1" / f"{i:06d}.png")
        c = rng.integers(0, 255, (40, 100, 3), dtype=np.uint8)
        Image.fromarray(c, "RGB").save(tmp_path / "image_2" / f"{i:06d}.png")
    return tmp_path


def test_kitti_reader(kitti_dir):
    r = KittiReader(str(kitti_dir), start_index=1, end_index=3)
    assert len(r) == 2
    frames = list(r)
    assert frames[0].index == 1 and frames[1].index == 2
    f = frames[0]
    assert f.left.shape == (40, 100) and f.left.dtype == np.float32
    assert 0.0 <= f.left.min() and f.left.max() <= 1.0
    assert f.color.shape == (40, 100, 3)
    assert f.semantic is None


def test_kitti_reader_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        KittiReader(str(tmp_path / "nope"))


def test_tum_reader(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(3):
        rgb = rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
        Image.fromarray(rgb, "RGB").save(tmp_path / "rgb" / f"{i}.png")
        d = (rng.uniform(0.5, 3.0, (30, 40)) * 5000).astype(np.uint16)
        Image.fromarray(d).save(tmp_path / "depth" / f"{i}.png")
        lines.append(f"{i}.0 rgb/{i}.png {i}.01 depth/{i}.png")
    (tmp_path / "associate.txt").write_text("\n".join(lines))
    r = TumReader(str(tmp_path))
    assert len(r) == 3
    f = r.get(0)
    assert f.depth.shape == (30, 40)
    assert 0.4 < f.depth.mean() < 3.1  # metres after /5000
    assert f.left.shape == (30, 40)


def test_parse_associate_skips_comments():
    rows = parse_associate("# header\n1.0 rgb/a.png 1.01 depth/a.png\n\nbad\n")
    assert len(rows) == 1


def test_kitti_pose_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    poses = []
    for _ in range(5):
        T = np.eye(4)
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    poses = np.stack(poses)
    p = tmp_path / "poses.txt"
    write_kitti_poses(p, poses)
    rec = read_kitti_poses(p)
    np.testing.assert_allclose(rec, poses, atol=1e-8)


def test_tum_trajectory_parse(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("# ts tx ty tz qx qy qz qw\n"
                 "1.0 1 2 3 0 0 0 1\n"
                 "2.0 4 5 6 0 0 0.7071068 0.7071068\n")
    ts, poses = read_tum_trajectory(p)
    assert ts.shape == (2,)
    np.testing.assert_allclose(poses[0, :3, 3], [1, 2, 3])
    np.testing.assert_allclose(poses[0, :3, :3], np.eye(3), atol=1e-12)
    # 90 degrees about z
    np.testing.assert_allclose(poses[1, :3, :3] @ np.array([1, 0, 0]),
                               [0, 1, 0], atol=1e-6)
