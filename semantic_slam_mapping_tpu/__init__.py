"""TPU-native semantic stereo SLAM + dense semantic mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference C++ system (MuMuJun97/semantic_slam_mapping): stereo visual
odometry (quad matching + RANSAC/Gauss-Newton), pose-graph optimization with
loop closure, U-V-disparity moving-object detection, SegNet semantic
segmentation, and dense voxelized semantic point-cloud mapping.

Unlike the reference's one-process/three-thread CPU design
(reference: src/pose_graph.cpp, src/mapper.cpp), this framework is built
TPU-first: fixed shapes + validity masks, `vmap` over features/hypotheses/
frames, `lax.scan` pipelines instead of threads, and `jax.sharding.Mesh`
collectives instead of shared memory.
"""

__version__ = "0.1.0"

from semantic_slam_mapping_tpu.config import SlamConfig, default_config

__all__ = ["SlamConfig", "default_config", "__version__"]
