"""heal_tpu — TPU-native collaborative 3D perception framework.

A from-scratch JAX / XLA / Pallas re-design of the capability surface of
HEAL / OpenCOOD (reference: yifanlu0227/HEAL): multi-agent collaborative
BEV 3D object detection with heterogeneous sensors and encoders, early /
intermediate / late fusion, the Pyramid-Fusion open-heterogeneity training
protocol, and AP@0.3/0.5/0.7 evaluation.

Design stance (vs. the PyTorch reference):
  * static shapes everywhere — agents padded to ``max_cav`` with masks
    (replaces ragged ``record_len`` concatenation), voxels padded to a
    fixed capacity, detections padded to ``max_det``;
  * pure-functional flax.linen models over parameter pytrees — checkpoint
    merging (HEAL stage 3) is a pytree union instead of state_dict surgery;
  * device math (voxelization, BEV warp, rotated IoU/NMS, fusion) in
    jnp/Pallas instead of CUDA extensions;
  * multi-device scaling via jax.sharding Mesh + jit instead of DDP/NCCL.
"""

__version__ = "0.1.0"
