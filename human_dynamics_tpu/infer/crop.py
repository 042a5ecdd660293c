"""Frame crop/normalize preprocessing for demo inference.

Behavioral port target: process_image
(/root/reference/src/evaluation/run_video.py:56-107) and resize_img
(/root/reference/src/util/common.py:7-14). Host-side numpy+cv2; this runs
once per frame before frames are shipped to the device.

Steps: [0,255] -> [-1,1]; resize by bbox scale; edge-pad by IMG_SIZE;
crop IMG_SIZE x IMG_SIZE around the (scaled) center. The returned
metadata (center, scale, start_pt, im_shape) is what the renderer needs
to undo the crop (nmr_renderer.py:333-419).
"""

from __future__ import annotations

from typing import Dict, Tuple

import cv2
import numpy as np

IMG_SIZE = 224


def resize_img(
    img: np.ndarray, scale_factor: float
) -> Tuple[np.ndarray, list]:
    new_size = (np.floor(np.array(img.shape[0:2]) * scale_factor)).astype(int)
    new_img = cv2.resize(img, (new_size[1], new_size[0]))
    actual_factor = [
        new_size[0] / float(img.shape[0]),
        new_size[1] / float(img.shape[1]),
    ]
    return new_img, actual_factor


def process_image(
    image: np.ndarray, bbox_param: np.ndarray, img_size: int = IMG_SIZE
) -> Dict:
    """Crop a (H, W, 3) uint8/float frame to a (224, 224, 3) [-1,1] crop.

    Args:
        image: raw frame (uint8 [0,255] or float already in [0,255]).
        bbox_param: [cx, cy, scale].

    Returns:
        dict(image, im_shape, center, scale, start_pt) per
        run_video.py:99-107.
    """
    center = bbox_param[:2]
    scale = bbox_param[2]

    image = ((image / 255.0) - 0.5) * 2
    image_scaled, scale_factors = resize_img(image, scale)
    center_scaled = np.round(center * scale_factors[::-1]).astype(int)

    # NOTE on scale_factors order: resize_img returns [fy, fx]; the
    # reference multiplies center=[cx, cy] by [fy, fx] directly
    # (run_video.py:75) — correct only when fx == fy, which holds because
    # the resize is isotropic. We use [fx, fy] (the mathematically right
    # pairing); identical results for isotropic scales.

    image_padded = np.pad(
        array=image_scaled,
        pad_width=((img_size,), (img_size,), (0,)),
        mode="edge",
    )
    height, width = image_padded.shape[:2]
    center_scaled = center_scaled + img_size

    margin = img_size // 2
    start_pt = (center_scaled - margin).astype(int)
    end_pt = (center_scaled + margin).astype(int)
    end_pt[0] = min(end_pt[0], width)
    end_pt[1] = min(end_pt[1], height)
    crop = image_padded[start_pt[1]:end_pt[1], start_pt[0]:end_pt[0], :]
    center_scaled = center_scaled - start_pt
    height, width = crop.shape[:2]

    return {
        "image": crop.astype(np.float32),
        "im_shape": [height, width],
        "center": center_scaled,
        "scale": scale,
        "start_pt": start_pt,
    }
