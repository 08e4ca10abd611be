"""Device-side (JAX/XLA/Pallas) operators.

TPU-native replacements for the reference's CUDA/Cython/spconv extensions
(SURVEY.md §2.7): rotated IoU + NMS (iou3d_nms_cuda), voxelization/pillar
scatter (spconv voxelizer + PointPillarScatter), BEV affine warp
(warp_affine_simple), sparse 3D conv (spconv) as gather-GEMM-scatter.
Everything is fixed-shape and jit-able.
"""
