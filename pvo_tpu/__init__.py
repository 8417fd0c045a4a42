"""pvo_tpu — a TPU-native Panoptic Visual Odometry framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of zju3dv/PVO
(CVPR 2023): recurrent dense visual odometry with differentiable dense
bundle adjustment, dynamic-object masking, a panoptic segmentation module
(Panoptic FPN) with flow-guided feature fusion, and the VO<->VPS exchange
pipeline — designed for TPU (static shapes, lax control flow, pjit/shard_map
data parallelism, MXU-friendly kernels) rather than translated from the
reference's CUDA/torch implementation.
"""

__version__ = "0.1.0"
