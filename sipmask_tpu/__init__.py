"""sipmask_tpu — a TPU-native (JAX/XLA/Pallas/pjit) instance-segmentation framework.

Re-implements the full capability surface of SipMask (ECCV 2020,
github.com/JialeCao001/SipMask) as a single unified framework designed for TPU:

- FCOS-style anchor-free detection towers + the Spatial Preservation (SP)
  module (4 per-quadrant coefficient vectors x 32 basis masks).
- High-accuracy (800x1333) and real-time (544x544, ``ssd_flag``) image
  variants, SipMask++ (DCN backbone + mask rescoring), and SipMask-VIS
  (video instance segmentation with a tracking branch).

Design stance (vs. the reference's CUDA/mmdetection implementation):
static shapes everywhere (pad + mask instead of boolean indexing), the whole
detect->mask path under ``jax.jit``, data parallelism via ``jax.sharding``
meshes, and XLA/Pallas formulations of every custom CUDA op (deformable conv,
crop_split, NMS, focal loss).
"""

__version__ = "0.1.0"
