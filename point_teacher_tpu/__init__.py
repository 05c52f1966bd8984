"""point-teacher-tpu: TPU-native (JAX/XLA/Pallas) point-supervised tiny-object detection.

A from-scratch re-design of the capabilities of ZhuHaoranEIS/Point-Teacher
(reference mounted at /root/reference) for TPU hardware:

- pure-functional teacher/student EMA training (no DDP, no mutable module state)
- static-shape, mask-padded batch processing (no ragged per-image python loops)
- XLA-friendly label assignment (vectorised top-k instead of per-GT loops)
- device-side synthetic image generation (no cv2 host round trips)
- pjit/shard_map data parallelism over a `jax.sharding.Mesh`
"""

__version__ = "0.1.0"
