"""Image IO: LDR via PIL/imageio with sRGB conversion, HDR (EXR/HDR) via
OpenCV.  Reference: pyredner/image.py (imwrite/imread).
"""

from __future__ import annotations

import os

import numpy as np


def srgb_to_linear(x):
    x = np.asarray(x, np.float32)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = np.asarray(x, np.float32)
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1.0 / 2.4) - 0.055)


def imread(filename: str, gamma: float = 2.2) -> np.ndarray:
    """Read an image -> float32 linear-radiance array (H, W, C).

    EXR/HDR are read as-is; LDR formats are converted from sRGB
    (reference pyredner/image.py:44-71).
    """
    ext = os.path.splitext(filename)[1].lower()
    if ext in (".exr", ".hdr"):
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        img = cv2.imread(filename, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
        if img is None and ext == ".exr":
            # This container's OpenCV has no EXR support; the pure-Python
            # codec covers uncompressed/ZIP scanline files (the reference
            # fixtures and everything imwrite produces).
            from redner_tpu.io.exr import read_exr

            return read_exr(filename)
        if img is None:
            raise IOError(f"cannot read {filename}")
        if img.ndim == 3 and img.shape[2] >= 3:
            img = img[..., [2, 1, 0] + list(range(3, img.shape[2]))]  # BGR->RGB
        return np.asarray(img, np.float32)
    from PIL import Image

    img = np.asarray(Image.open(filename), np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if gamma == 2.2:
        return srgb_to_linear(img)
    return img ** gamma


def imwrite(img, filename: str, gamma: float = 2.2, normalize: bool = False):
    """Write a linear-radiance image; LDR formats get sRGB encoding
    (reference pyredner/image.py:7-42)."""
    img = np.asarray(img, np.float32)
    if normalize:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / max(hi - lo, 1e-12)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".exr":
        # Pure-Python writer (float32 scanline, NONE compression): the
        # container's OpenCV cannot write EXR at all.
        from redner_tpu.io.exr import write_exr

        write_exr(filename, img)
        return
    if ext == ".hdr":
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2

        out = img
        if out.ndim == 3 and out.shape[2] >= 3:
            out = out[..., [2, 1, 0]]
        cv2.imwrite(filename, out.astype(np.float32))
        return
    from PIL import Image

    if gamma == 2.2:
        ldr = linear_to_srgb(img)
    else:
        ldr = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    u8 = (ldr * 255.0 + 0.5).astype(np.uint8)
    if u8.ndim == 3 and u8.shape[2] == 1:
        u8 = u8[..., 0]
    Image.fromarray(u8).save(filename)
