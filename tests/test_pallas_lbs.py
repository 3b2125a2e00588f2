"""Pallas fused-LBS kernel vs the XLA einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.ops import mano as manolib
from hands_tpu.ops.mano_pallas import lbs_apply


def _reference_lbs(v_posed, w, A):
    T = jnp.einsum("vj,bjrc->bvrc", w, A)
    vh = jnp.concatenate(
        [v_posed, jnp.ones(v_posed.shape[:2] + (1,), v_posed.dtype)], -1)
    return jnp.einsum("bvrc,bvc->bvr", T, vh)[..., :3]


def test_lbs_kernel_matches_einsum(rng):
    B = 3
    model = manolib.load_mano(True)
    v_posed = jnp.asarray(rng.randn(B, 778, 3) * 0.1, jnp.float32)
    # realistic skinning transforms: small rotations + translations
    from hands_tpu.core import rot as rotlib

    R = rotlib.axis_angle_to_matrix(
        jnp.asarray(rng.randn(B, 16, 3) * 0.3, jnp.float32))
    t = jnp.asarray(rng.randn(B, 16, 3) * 0.05, jnp.float32)
    A = jnp.zeros((B, 16, 4, 4))
    A = A.at[:, :, :3, :3].set(R)
    A = A.at[:, :, :3, 3].set(t)
    A = A.at[:, :, 3, 3].set(1.0)

    ref = _reference_lbs(v_posed, model.lbs_weights, A)
    out = lbs_apply(v_posed, model.lbs_weights, A, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
