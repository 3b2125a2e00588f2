"""Software renderer + visualisation pipeline."""

import numpy as np

from hands_tpu.render.software import overlay_mesh, render_mesh, rotate_sideview


def _square_mesh(z=0.5, half=0.05):
    verts = np.asarray(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


K = np.asarray([[200.0, 0, 56], [0, 200.0, 56], [0, 0, 1]], np.float32)


def test_render_mesh_covers_projection():
    verts, faces = _square_mesh()
    img, alpha = render_mesh(verts, faces, K, (112, 112))
    # centre of the square projects to the principal point
    assert alpha[56, 56] == 1.0
    # corners of the canvas stay empty
    assert alpha[0, 0] == 0.0 and alpha[-1, -1] == 0.0
    # projected extent: half*f/z = 0.05*200/0.5 = 20px around centre
    assert alpha[56, 56 - 19] == 1.0
    assert alpha[56, 56 - 25] == 0.0


def test_zbuffer_front_wins():
    vf, ff = _square_mesh(z=0.4)
    vb, fb = _square_mesh(z=0.8)
    verts = np.concatenate([vb, vf])
    faces = np.concatenate([fb, ff + 4])
    img_front, _ = render_mesh(vf, ff, K, (112, 112))
    img_both, _ = render_mesh(verts, faces, K, (112, 112))
    np.testing.assert_allclose(img_both[56, 56], img_front[56, 56], atol=1e-5)


def test_overlay_blends():
    verts, faces = _square_mesh()
    base = np.zeros((112, 112, 3), np.float32)
    out = overlay_mesh(base, verts, faces, K, opacity=1.0)
    assert out[56, 56].sum() > 0.3
    assert out[0, 0].sum() == 0.0


def test_sideview_rotation_preserves_centroid():
    verts, _ = _square_mesh()
    rot = rotate_sideview(verts)
    np.testing.assert_allclose(rot.mean(0), verts.mean(0), atol=1e-6)


def test_visualize_all_from_model_output():
    import jax

    from hands_tpu.config import default_config
    from hands_tpu.core.xdict import XDict
    from hands_tpu.data.synthetic import make_batch
    from hands_tpu.models.hands_light import HandsLightModel
    from hands_tpu.utils.vis import visualize_all

    cfg = default_config(
        "hands_light", backbone="resnet18", compute_dtype="float32",
        use_glb_feat=False, use_grasp_loss=False, use_render_seg_loss=False,
    )
    inputs, targets, meta = make_batch(cfg, 1, seed=0)
    model = HandsLightModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), inputs, meta)
    pred = model(variables, inputs, meta, train=False)
    vis_dict = XDict()
    vis_dict.merge(XDict(inputs).prefix("inputs."))
    vis_dict.merge(XDict(pred).prefix("pred."))
    vis_dict.merge(XDict(targets).prefix("targets."))
    vis_dict.merge(XDict(meta).prefix("meta_info."))
    images = visualize_all(vis_dict, cfg, max_examples=1)
    names = [n for n, _ in images]
    # reference-layout figure set (visualize_arctic.py:116-392): one 2x2 kp
    # grid per flag + the titled [input | pred render] strip
    assert "0__targets_kps" in names and "0__pred_kps" in names
    assert any(n.startswith("0__rend_rvalid=") for n in names)
    for _, img in images:
        assert img.ndim == 3 and img.shape[2] == 3
    # the kp grid is a 2x2 matplotlib figure (roughly square, ~600px)
    grid = dict(images)["0__pred_kps"]
    assert abs(grid.shape[0] - grid.shape[1]) < grid.shape[0] * 0.2
