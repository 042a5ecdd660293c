"""Mesh renderer: native C++ orthographic z-buffer rasterizer.

API-compatible replacement for the reference's VisRenderer
(/root/reference/src/util/render/nmr_renderer.py:43-240), which wraps the
CUDA neural_renderer. Differentiability is not needed (vis only,
nmr_renderer.py:47): the C++ rasterizer in native/rasterizer.cpp is
compiled on first use (g++ -O3) and called through ctypes; a numpy
fallback keeps everything working without a toolchain.

Rendering conventions preserved:
- weak-perspective projection xy' = s * (xy + t), z kept
  (torch_utils.py:11-30), then y flipped to image coords
  (nmr_renderer.py:141-143);
- light direction [1, .5, -1], intensities dir 0.3 / amb 0.7, white
  background (nmr_renderer.py:59-60);
- color palette from the reference's renderer colors.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

# nmr_renderer.py's mesh color palette (values in [0, 1]).
MESH_COLORS = {
    "blue": [0.65098039, 0.74117647, 0.85882353],
    "pink": [0.9, 0.7, 0.7],
    "mint": [166 / 255.0, 229 / 255.0, 204 / 255.0],
    "mint2": [202 / 255.0, 229 / 255.0, 223 / 255.0],
    "green": [153 / 255.0, 216 / 255.0, 201 / 255.0],
    "green2": [171 / 255.0, 221 / 255.0, 164 / 255.0],
    "red": [251 / 255.0, 128 / 255.0, 114 / 255.0],
    "orange": [253 / 255.0, 174 / 255.0, 97 / 255.0],
    "yellow": [250 / 255.0, 230 / 255.0, 154 / 255.0],
}

_LIB = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")


def _load_library():
    """Compile (once) and load the C++ rasterizer; None on failure."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_native_dir(), "rasterizer.cpp")
    so = os.path.join(_native_dir(), "librasterizer.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.render_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.render_mesh.restype = None
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        _LIB = None
    return _LIB


def _rasterize_numpy(proj, faces, size, color, light_dir, int_dir, int_amb):
    """Vectorized numpy fallback rasterizer (same math as the C++)."""
    rgb = np.zeros((size, size, 3), np.float32)
    mask = np.zeros((size, size), np.float32)
    zbuf = np.full((size, size), 1e30, np.float32)

    half = size / 2.0
    pix = (proj[:, :2] + 1.0) * half
    z = proj[:, 2]
    l = np.asarray(light_dir, np.float32)
    l = l / np.linalg.norm(l)

    tri = pix[faces]                      # (F, 3, 2)
    tz = z[faces]                         # (F, 3)
    # Lighting per face.
    p3 = np.concatenate(
        [pix[faces][:, :, :1], -pix[faces][:, :, 1:2], tz[..., None]],
        axis=2,
    )
    n = np.cross(p3[:, 1] - p3[:, 0], p3[:, 2] - p3[:, 0])
    nn = np.linalg.norm(n, axis=1, keepdims=True)
    ok = nn[:, 0] > 1e-12
    n = n / np.maximum(nn, 1e-12)
    flip = n[:, 2] > 0
    n[flip] = -n[flip]
    intensity = np.minimum(
        1.0, int_amb + int_dir * np.maximum(0.0, n @ l)
    )
    face_rgb = np.minimum(1.0, np.asarray(color) * intensity[:, None])

    for f in np.nonzero(ok)[0]:
        (x0, y0), (x1, y1), (x2, y2) = tri[f]
        min_x = max(int(np.floor(min(x0, x1, x2))), 0)
        max_x = min(int(np.ceil(max(x0, x1, x2))), size - 1)
        min_y = max(int(np.floor(min(y0, y1, y2))), 0)
        max_y = min(int(np.ceil(max(y0, y1, y2))), size - 1)
        if min_x > max_x or min_y > max_y:
            continue
        denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(denom) < 1e-12:
            continue
        xs = np.arange(min_x, max_x + 1) + 0.5
        ys = np.arange(min_y, max_y + 1) + 0.5
        gx, gy = np.meshgrid(xs, ys)
        w0 = ((y1 - y2) * (gx - x2) + (x2 - x1) * (gy - y2)) / denom
        w1 = ((y2 - y0) * (gx - x2) + (x0 - x2) * (gy - y2)) / denom
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zf = w0 * tz[f, 0] + w1 * tz[f, 1] + w2 * tz[f, 2]
        sub_z = zbuf[min_y:max_y + 1, min_x:max_x + 1]
        upd = inside & (zf < sub_z)
        sub_z[upd] = zf[upd]
        rgb[min_y:max_y + 1, min_x:max_x + 1][upd] = face_rgb[f]
        mask[min_y:max_y + 1, min_x:max_x + 1][upd] = 1.0
    return rgb, mask


class VisRenderer:
    """Renders SMPL meshes with weak-perspective cameras.

    Args mirror nmr_renderer.py:52-60. faces: (F, 3) int array or a path
    to the smpl_faces .npy.
    """

    def __init__(self, img_size: int = 256, faces=None, face_path=None):
        self.img_size = img_size
        if faces is None:
            if face_path is None:
                raise ValueError("Provide faces array or face_path")
            faces = np.load(face_path)
        self.faces = np.ascontiguousarray(faces, np.int32)
        self.light_dir = np.asarray([1.0, 0.5, -1.0], np.float32)
        self.int_dir = 0.3
        self.int_amb = 0.7
        self.bg_color = np.asarray([1.0, 1.0, 1.0], np.float32)

    def set_light_dir(self, direction, int_dir=0.8, int_amb=0.8):
        self.light_dir = np.asarray(direction, np.float32)
        self.int_dir = float(int_dir)
        self.int_amb = float(int_amb)

    def set_bgcolor(self, color):
        self.bg_color = np.asarray(color, np.float32)

    def _project(self, verts, cam):
        """Weak perspective + y flip -> (V, 3) screen coords."""
        cam = np.asarray(cam, np.float32).reshape(3)
        xy = cam[0] * (verts[:, :2] + cam[1:])
        proj = np.column_stack([xy[:, 0], -xy[:, 1], verts[:, 2]])
        return np.ascontiguousarray(proj, np.float32)

    def _render_single(self, verts, cam, color_name, img_size=None):
        proj = self._project(np.asarray(verts, np.float32), cam)
        color = np.asarray(MESH_COLORS[color_name], np.float32)
        size = img_size or self.img_size
        lib = _load_library()
        if lib is not None:
            rgb = np.zeros((size, size, 3), np.float32)
            mask = np.zeros((size, size), np.float32)
            lib.render_mesh(
                proj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(proj),
                self.faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(self.faces),
                size,
                color.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.light_dir.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)
                ),
                ctypes.c_float(self.int_dir),
                ctypes.c_float(self.int_amb),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        else:
            rgb, mask = _rasterize_numpy(
                proj, self.faces, size, color,
                self.light_dir, self.int_dir, self.int_amb,
            )
        return rgb, mask

    def __call__(
        self,
        verts: np.ndarray,
        cam: Optional[np.ndarray] = None,
        rend_mask: bool = False,
        alpha: bool = False,
        img: Optional[np.ndarray] = None,
        color_name: str = "blue",
        img_size: Optional[int] = None,
    ) -> np.ndarray:
        """verts (V, 3) [or (B, V, 3)], cam (3,) [or (B, 3)] -> uint8 image.

        Mirrors nmr_renderer.py:81-174: returns the rendered mesh over a
        white background, a silhouette if rend_mask, an RGBA image if
        alpha, or composites over `img` ([0,255]) when given.
        """
        verts = np.asarray(verts, np.float32)
        if verts.ndim == 3:
            outs = [
                self.__call__(
                    verts[i],
                    None if cam is None else np.asarray(cam)[i],
                    rend_mask, alpha,
                    None if img is None else img[i],
                    color_name, img_size,
                )
                for i in range(len(verts))
            ]
            return np.stack(outs)

        if cam is None:
            cam = np.asarray([0.9, 0.0, 0.0], np.float32)

        if img is not None and img_size is None:
            img_size = img.shape[0]
        rgb, mask = self._render_single(verts, cam, color_name, img_size)

        if rend_mask:
            sil = (mask * 255).astype(np.uint8)
            return np.repeat(sil[:, :, None], 3, axis=2)

        rend = rgb * mask[:, :, None] + self.bg_color * (
            1.0 - mask[:, :, None]
        )
        rend = (np.clip(rend, 0, 1) * 255).astype(np.uint8)

        if img is not None:
            m = mask[:, :, None]
            return (img * (1 - m) + rend * m).astype(np.uint8)
        if alpha:
            a = (mask * 255).astype(np.uint8)
            return np.dstack((rend, a))
        return rend

    def rotated(
        self, verts, deg, axis="y", cam=None, **kwargs
    ) -> np.ndarray:  # kwargs: rend_mask/alpha/img/color_name/img_size
        """Render a view rotated deg degrees about the vert centroid
        (nmr_renderer.py:176-225)."""
        import cv2

        axis_vec = {
            "x": [1.0, 0, 0], "y": [0, 1.0, 0], "z": [0, 0, 1.0]
        }[axis]
        rot = cv2.Rodrigues(np.deg2rad(deg) * np.array(axis_vec))[0]
        verts = np.asarray(verts, np.float32)
        center = verts.mean(axis=0, keepdims=True)
        new_verts = (verts - center) @ rot.T + center
        return self.__call__(new_verts, cam=cam, **kwargs)
