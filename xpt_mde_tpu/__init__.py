"""xpt_mde_tpu: TPU-native self-supervised monocular depth + visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
goodgodgd/xpt-mde-2021 ("VODE": Visual Odometry & Depth Estimation,
IEEE Access 2021 "Self-Supervised Monocular Depth Estimation With
Extensive Pretraining").

Subpackages
-----------
- ``config``     typed config system + training/test plans
- ``utils``      SE(3) pose math, image helpers, infra classes
- ``ops``        geometry / view-synthesis ops (jnp reference + Pallas kernels)
- ``models``     Flax models: DepthNet, PoseNet, PWC-Net, backbones
- ``losses``     photometric / smoothness / stereo / flow losses + registry
- ``data``       dataset readers, snippet example maker, shard IO, loaders
- ``training``   plan-driven trainer, augmentation, checkpointing, logging
- ``parallel``   device meshes and sharded train steps (pjit / shard_map)
- ``evaluate``   Eigen-split depth metrics, snippet pose metrics, drivers
"""

__version__ = "0.1.0"
