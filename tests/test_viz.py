"""Renderer + skeleton drawing tests (native C++ rasterizer and numpy
fallback must agree)."""

import numpy as np
import pytest

from human_dynamics_tpu.viz.renderer import (
    VisRenderer,
    _load_library,
    _rasterize_numpy,
    MESH_COLORS,
)
from human_dynamics_tpu.viz.skeleton import draw_skeleton, draw_text

RNG = np.random.RandomState(2)


def make_quad():
    """Two triangles forming a square in the image center."""
    verts = np.array([
        [-0.5, -0.5, 0.0],
        [0.5, -0.5, 0.0],
        [0.5, 0.5, 0.0],
        [-0.5, 0.5, 0.0],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_native_library_compiles():
    lib = _load_library()
    assert lib is not None, "C++ rasterizer failed to build"


def test_render_quad_coverage():
    verts, faces = make_quad()
    r = VisRenderer(img_size=64, faces=faces)
    img = r(verts, cam=np.array([1.0, 0.0, 0.0]))
    assert img.shape == (64, 64, 3)
    # Center covered with the blue-ish mesh color, corners background white.
    assert img[32, 32, 2] > 150
    np.testing.assert_array_equal(img[1, 1], [255, 255, 255])
    # Silhouette mask mode.
    sil = r(verts, cam=np.array([1.0, 0.0, 0.0]), rend_mask=True)
    assert sil[32, 32, 0] == 255 and sil[1, 1, 0] == 0
    # Mask covers ~ (0.5 image)^2 of pixels.
    frac = (sil[:, :, 0] > 0).mean()
    assert 0.2 < frac < 0.3


def test_render_zbuffer_occlusion():
    # Two stacked quads; the nearer (smaller z) one must win.
    verts = np.array([
        [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5],
        [-0.5, 0.5, 0.5],                       # far quad
        [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5],
        [-0.5, 0.5, -0.5],                      # near quad
    ], np.float32)
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    r = VisRenderer(img_size=64, faces=faces[:2])
    img_far = r(verts[:4], cam=np.array([1.0, 0, 0]), color_name="red")
    r2 = VisRenderer(img_size=64, faces=faces)
    img_both = r2(verts, cam=np.array([1.0, 0, 0]), color_name="red")
    # Both images are red-mesh renders; with both quads the near one
    # shadows the far one (identical footprint -> identical image).
    assert img_both[32, 32, 0] > 150
    assert img_far.shape == img_both.shape


def test_native_matches_numpy_fallback():
    verts = RNG.randn(30, 3).astype(np.float32) * 0.5
    faces = RNG.randint(0, 30, (40, 3)).astype(np.int32)
    proj = verts.copy()
    color = np.asarray(MESH_COLORS["blue"], np.float32)
    light = np.asarray([1.0, 0.5, -1.0], np.float32)

    rgb_np, mask_np = _rasterize_numpy(
        proj, faces, 48, color, light, 0.3, 0.7
    )

    lib = _load_library()
    assert lib is not None
    import ctypes

    rgb_c = np.zeros((48, 48, 3), np.float32)
    mask_c = np.zeros((48, 48), np.float32)
    proj_c = np.ascontiguousarray(proj)
    lib.render_mesh(
        proj_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(proj),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        48,
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        light.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(0.3), ctypes.c_float(0.7),
        rgb_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    np.testing.assert_array_equal(mask_np, mask_c)
    np.testing.assert_allclose(rgb_np, rgb_c, atol=1e-5)


def test_render_batched_and_composite():
    verts, faces = make_quad()
    r = VisRenderer(img_size=32, faces=faces)
    batch = np.stack([verts, verts * 0.5])
    cams = np.tile(np.array([1.0, 0, 0]), (2, 1))
    out = r(batch, cam=cams)
    assert out.shape == (2, 32, 32, 3)
    # Composite over an image.
    bg = np.zeros((32, 32, 3), np.uint8)
    comp = r(verts, cam=np.array([1.0, 0, 0]), img=bg)
    assert comp[16, 16, 2] > 100      # mesh drawn
    np.testing.assert_array_equal(comp[0, 0], [0, 0, 0])  # bg kept


def test_render_rotated():
    verts, faces = make_quad()
    r = VisRenderer(img_size=32, faces=faces)
    out = r.rotated(verts, deg=60, axis="y", cam=np.array([1.0, 0, 0]))
    assert out.shape == (32, 32, 3)
    # Rotation about y shrinks the horizontal extent of the silhouette.
    sil = r.rotated(verts, deg=60, axis="y", cam=np.array([1.0, 0, 0]),
                    rend_mask=True)
    sil0 = r(verts, cam=np.array([1.0, 0, 0]), rend_mask=True)
    assert (sil[:, :, 0] > 0).sum() < (sil0[:, :, 0] > 0).sum()


def test_draw_skeleton_shapes():
    img = np.zeros((224, 224, 3), np.uint8)
    for k in (14, 19, 25):
        joints = RNG.uniform(20, 200, (k, 2))
        out = draw_skeleton(img, joints)
        assert out.shape == img.shape
        assert out.sum() > 0       # something was drawn
    with pytest.raises(ValueError):
        draw_skeleton(img, RNG.rand(7, 2))


def test_draw_skeleton_vis_mask():
    img = np.zeros((224, 224, 3), np.uint8)
    joints = RNG.uniform(20, 200, (25, 2))
    vis = np.zeros(25)
    out = draw_skeleton(img, joints, vis=vis)
    assert out.sum() == 0          # nothing visible -> nothing drawn


def test_draw_text():
    # Black text on a white image must darken some pixels.
    img = np.full((224, 224, 3), 255, np.uint8)
    out = draw_text(img, {"err": 1.234, "name": "x"})
    assert (out < 255).any()
    # Float image round trip.
    imgf = np.ones((224, 224, 3), np.float32)
    outf = draw_text(imgf, {"a": 1})
    assert outf.dtype == np.float32 and outf.max() <= 1.0
