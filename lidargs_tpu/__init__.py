"""lidargs_tpu — TPU-native differentiable LiDAR Gaussian-splatting framework.

A from-scratch JAX/Pallas re-design of the capabilities of cqf7419/LiDAR-GS
(arXiv 2410.05111): real-time LiDAR re-simulation with range-view laser-beam
splatting of a Scaffold-GS-style Neural Gaussian Field.

Layering (TPU-first, see SURVEY.md §7):
  lidar/     beam tables + range-view geometry (pure JAX, CPU-testable)
  ops/       splatting: projection, binning, tiled compositing (custom VJP),
             golden O(P*HW) reference renderer, KNN/chamfer
  models/    anchor field + MLP heads (capacity-padded, static shapes),
             densify/prune, raydrop refinement UNet
  data/      Waymo/KITTI AlignMiF readers, PLY + orbax checkpointing
  train/     losses, metrics, trainer, LR schedules
  parallel/  device mesh, sharded train/render steps
"""

__version__ = "0.1.0"
