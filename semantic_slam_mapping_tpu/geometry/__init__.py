from semantic_slam_mapping_tpu.geometry import se3, camera

__all__ = ["se3", "camera"]
