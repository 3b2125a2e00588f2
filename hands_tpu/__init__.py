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

# lazy top-level API: `hands_tpu.Trainer` etc. without importing jax/flax
# at package-import time (keeps `import hands_tpu` instant for CLI --help
# and pure-host tooling)
_LAZY = {
    "Config": "hands_tpu.config",
    "default_config": "hands_tpu.config",
    "construct_args": "hands_tpu.config",
    "fetch_model": "hands_tpu.models.registry",
    "inference_pose": "hands_tpu.models.registry",
    "fetch_dataset": "hands_tpu.data.datasets",
    "fetch_dataloader": "hands_tpu.data.factory",
    "Trainer": "hands_tpu.train.trainer",
    "XDict": "hands_tpu.core.xdict",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'hands_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
