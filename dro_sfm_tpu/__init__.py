"""dro_sfm_tpu — a TPU-native deep recurrent structure-from-motion framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the PyTorch
reference xyang9527/dro-sfm ("DRO: Deep Recurrent Optimizer for
Structure-from-Motion", arXiv:2103.13201): multi-frame depth + 6-DoF pose
estimation via a recurrent GRU optimizer descending a feature-metric cost,
trained supervised or self-supervised, scaled over TPU meshes with
jax.sharding instead of Horovod/NCCL.

Subpackages
-----------
geometry   : pinhole camera, SE(3) pose algebra, rotation conversions
ops        : bilinear resampling, SSIM, convex upsampling, Pallas kernels
models     : flax networks (encoders, GRU update blocks, DepthPoseNet) and
             task models (self-supervised / supervised / semi-supervised)
losses     : photometric and supervised depth/pose losses
data       : dataset readers, transforms, host-sharded loading
parallel   : device mesh + sharding helpers
training   : train/eval steps, trainer loop, checkpointing, metrics
utils      : config system, depth/image helpers, logging
"""

__version__ = "0.1.0"
