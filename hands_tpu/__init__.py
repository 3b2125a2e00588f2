"""hands_tpu — a TPU-native (JAX/XLA/Pallas) hand-pose estimation framework.

Re-implements the capabilities of the WildHands reference stack
(WildHands / HaMeR / HandOccNet / ArcticNet-SF model families, the
xdict batch schema, mixed-dataset flag-gated training, and the
MPJPE/PA-MPJPE/pix_err evaluation suite) as an idiomatic JAX framework:

- fused on-device preprocessing (crop/augment/KPE) instead of cv2 workers
- jitted Flax models on bf16 MXU paths
- a hand-written JAX MANO layer (pose blend shapes + LBS)
- batch-sharded pjit/shard_map data parallelism over a device mesh
- batched on-device eval (incl. Procrustes SVD)
"""

__version__ = "0.1.0"
