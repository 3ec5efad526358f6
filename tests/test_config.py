from pathlib import Path

from semantic_slam_mapping_tpu.config import (
    default_config, load_parameters_file, parse_parameters_text)

REF_STYLE = """
# comment line
start_index=1271
end_index=1800
camera.fx=718.8560
camera.baseline=0.532331858
camera.d1=0.1
orb_features=2000
looper_min_sim_score=0.015
mapper_resolution=0.1
motion_overlay_portion_thres=0.143
"""


def test_parse_key_value():
    raw = parse_parameters_text(REF_STYLE)
    assert raw["start_index"] == "1271"
    assert "# comment line" not in raw


def test_load_parameters_file(tmp_path: Path):
    p = tmp_path / "parameters.txt"
    p.write_text(REF_STYLE)
    cfg = load_parameters_file(p)
    assert cfg.dataset.start_index == 1271
    assert cfg.dataset.end_index == 1800
    assert cfg.camera.fx == 718.8560
    assert cfg.camera.baseline == 0.532331858
    assert cfg.camera.d[1] == 0.1
    assert cfg.orb.n_features == 2000
    assert cfg.looper.min_sim_score == 0.015
    assert cfg.mapper.resolution == 0.1
    assert cfg.mapper.motion_overlay_portion_threshold == 0.143


def test_defaults_match_reference_operating_point():
    cfg = default_config()
    # parameters.txt:66-71
    assert cfg.orb.n_features == 2000
    assert cfg.orb.n_levels == 8
    assert cfg.orb.scale_factor == 1.2
    # stereo.cpp:16-28
    assert cfg.sgbm.num_disparities == 80
    assert cfg.sgbm.sad_window_size == 11
    # vo_stereo.hpp:32
    assert cfg.vo.ransac_iters == 200
    # pnp.cpp chi2 gate
    assert abs(cfg.pnp.chi2_threshold - 5.991) < 1e-9
    # parameters.txt:84-88
    assert cfg.pose_graph.keyframe_min_translation == 5.5
    assert cfg.pose_graph.loop_accumulate_error == 4.0
