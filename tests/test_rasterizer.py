"""Differentiable silhouette renderers: splat + soft raster."""

import jax
import jax.numpy as jnp
import numpy as np

from hands_tpu.ops.rasterizer import soft_raster_silhouette, splat_silhouette

K = jnp.asarray([[[200.0, 0, 56], [0, 200.0, 56], [0, 0, 1]]], jnp.float32)


def _square(z=0.5, half=0.08):
    verts = jnp.asarray(
        [[[-half, -half, z], [half, -half, z], [half, half, z],
          [-half, half, z]]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def test_soft_raster_covers_triangle_interior():
    verts, faces = _square()
    mask = np.asarray(soft_raster_silhouette(verts, faces, K, 112,
                                             sigma_px=0.5))[0]
    # square spans +-32px around the principal point (56, 56); probe points
    # strictly interior/exterior (the exact centre sits on the shared
    # diagonal edge where each face contributes sigmoid(0)=0.5 -> 0.75)
    assert mask[56, 56 - 25] > 0.9
    assert mask[56 - 20, 56 + 10] > 0.9
    assert mask[56, 56] > 0.7
    assert mask[56, 56 - 45] < 0.1
    assert mask[5, 5] < 0.05


def test_soft_raster_is_differentiable():
    verts, faces = _square()

    def area(v):
        return soft_raster_silhouette(v, faces, K, 56, sigma_px=1.0).sum()

    g = jax.grad(area)(verts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_splat_covers_vertices():
    verts, _ = _square()
    mask = np.asarray(splat_silhouette(verts, K, 112, sigma_px=4.0))[0]
    # corners of the square (+-32px from centre) are covered
    assert mask[56 - 32, 56 - 32] > 0.5
    assert mask[5, 5] < 0.05


def test_splat_and_soft_raster_agree_roughly():
    """Dense meshes: vertex splatting approximates the face raster."""
    rng = np.random.RandomState(0)
    # dense point cloud on a disc + fan triangulation
    n = 200
    ang = rng.rand(n) * 2 * np.pi
    rad = np.sqrt(rng.rand(n)) * 0.08
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                    np.full(n, 0.5)], -1).astype(np.float32)
    verts = jnp.asarray(pts)[None]
    faces = jnp.asarray(
        np.stack([np.zeros(n - 2), np.arange(1, n - 1),
                  np.arange(2, n)], -1).astype(np.int32))
    soft = np.asarray(soft_raster_silhouette(verts, faces, K, 112,
                                             sigma_px=0.5))[0]
    splat = np.asarray(splat_silhouette(verts, K, 112, sigma_px=3.0))[0]
    inter = ((soft > 0.5) & (splat > 0.5)).sum()
    union = ((soft > 0.5) | (splat > 0.5)).sum()
    assert inter / union > 0.5  # IoU of the two silhouette estimates
