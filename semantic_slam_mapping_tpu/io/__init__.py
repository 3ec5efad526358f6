from semantic_slam_mapping_tpu.io.frame import StereoFrame

__all__ = ["StereoFrame"]
