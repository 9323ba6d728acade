"""hmvit_tpu — TPU-native cooperative perception framework (HM-ViT capabilities).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HM-ViT
(XHwind/HM-ViT, ICCV 2023): multi-agent, hetero-modal (camera + LiDAR)
vehicle-to-vehicle cooperative 3D detection on OPV2V.

Design principles (TPU-first):
  * static shapes everywhere — padded agent slots + boolean masks instead of
    ragged tensors;
  * hetero-typed parameters as stacked weights indexed by per-agent modality,
    so the whole H3GAT fusion compiles to one XLA program;
  * the full inference inner loop (voxelize, encode, warp, fuse, decode,
    NMS) is jit-able — no host round-trips;
  * multi-device scaling via `jax.sharding.Mesh` + NamedSharding, not
    process-group plumbing.
"""

__version__ = "0.1.0"

GT_RANGE = [-102.4, -102.4, -3.0, 102.4, 102.4, 1.0]
CAMERA_GT_RANGE = [-50.0, -50.0, -3.0, 50.0, 50.0, 1.0]
COM_RANGE = 50.0
