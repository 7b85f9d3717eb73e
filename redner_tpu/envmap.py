"""Environment map (lat-long) lighting: evaluation, importance sampling, pdf.

TPU-native re-design of the reference envmap (src/envmap.h:62-306,
pyredner/envmap.py:36-60).  The luminance CDF tables are built in
differentiable JAX but stop-gradiented (the reference likewise returns no
gradients for CDFs/pdf_norm — SURVEY A.3); gradients reach the envmap only
through `envmap_eval`'s texture fetch and the world_to_env transform.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from flax import struct

from redner_tpu.core import transform as xf
from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import RayDifferential
from redner_tpu.texture import (PackedTexture, Texture, make_texture,
                                pack_texture, texture_eval)


@struct.dataclass
class EnvironmentMap:
    """User-facing environment map (pyredner/envmap.py)."""

    values: Texture  # (H, W, 3) base texels
    env_to_world: jnp.ndarray  # (4, 4)
    world_to_env: jnp.ndarray  # (4, 4)
    directly_visible: bool = struct.field(pytree_node=False, default=True)


def make_environment_map(values, env_to_world=None, directly_visible=True,
                         dtype=jnp.float32) -> EnvironmentMap:
    if not isinstance(values, Texture):
        values = make_texture(values, dtype=dtype)
    if env_to_world is None:
        env_to_world = jnp.eye(4, dtype=dtype)
    else:
        env_to_world = jnp.asarray(env_to_world, dtype)
    return EnvironmentMap(
        values=values,
        env_to_world=env_to_world,
        world_to_env=jnp.linalg.inv(env_to_world),
        directly_visible=bool(directly_visible),
    )


@struct.dataclass
class PackedEnvmap:
    """Render-ready envmap: packed mipmap + sampling CDFs."""

    ptex: PackedTexture
    env_to_world: jnp.ndarray
    world_to_env: jnp.ndarray
    sample_cdf_xs: jnp.ndarray  # (H, W) per-row conditional CDF
    sample_cdf_ys: jnp.ndarray  # (H,) marginal CDF
    pdf_norm: jnp.ndarray  # scalar
    base_luminance: jnp.ndarray  # (H, W) luminance of level 0 (stop-grad)
    directly_visible: bool = struct.field(pytree_node=False, default=True)

    @property
    def base_width(self):
        return self.ptex.widths[0]

    @property
    def base_height(self):
        return self.ptex.heights[0]


def pack_envmap(env: EnvironmentMap) -> PackedEnvmap:
    """Build CDF tables (pyredner/envmap.py:36-60 math) + packed mipmap."""
    texels = env.values.texels
    assert texels.ndim == 3, "environment map must be an image"
    lum = vm.luminance(texels)
    h, w = lum.shape
    cdf_xs_raw = jnp.cumsum(lum, axis=1)
    y_weight = jnp.sin(
        jnp.pi * (jnp.arange(h, dtype=texels.dtype) + 0.5) / float(h)
    )
    cdf_ys_raw = jnp.cumsum(cdf_xs_raw[:, -1] * y_weight, axis=0)
    pdf_norm = (h * w) / (cdf_ys_raw[-1] * (2.0 * jnp.pi * jnp.pi))
    cdf_xs = (cdf_xs_raw - cdf_xs_raw[:, :1]) / jnp.maximum(cdf_xs_raw[:, -1:], 1e-8)
    cdf_ys = (cdf_ys_raw - cdf_ys_raw[0]) / jnp.maximum(cdf_ys_raw[-1], 1e-8)
    sg = jax.lax.stop_gradient
    return PackedEnvmap(
        ptex=pack_texture(env.values),
        env_to_world=env.env_to_world,
        world_to_env=env.world_to_env,
        sample_cdf_xs=sg(cdf_xs),
        sample_cdf_ys=sg(cdf_ys),
        pdf_norm=sg(pdf_norm),
        base_luminance=sg(lum),
        directly_visible=env.directly_visible,
    )


def _safe_acos(x):
    # Strictly inside [-1, 1]: d(acos)/dx diverges at the boundary and the
    # infinite derivative leaks through downstream wheres (poles of the
    # lat-long map; reference clamps with 1-1e-6 too).
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6))


def _dir_to_uv(local_dir):
    """Spherical (lat-long) parameterization, y up (src/envmap.h:66-72)."""
    u = jnp.arctan2(local_dir[..., 0], -local_dir[..., 2]) / (2.0 * jnp.pi)
    v = _safe_acos(local_dir[..., 1]) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def envmap_eval(penv: PackedEnvmap, dir, ray_diff: RayDifferential):
    """Radiance from direction(s) with mip filtering (src/envmap.h:64-100)."""
    local_dir = vm.normalize(xf.xfm_vector(penv.world_to_env, dir))
    uv = _dir_to_uv(local_dir)
    ldx = xf.xfm_vector(penv.world_to_env, ray_diff.dir_dx)
    ldy = xf.xfm_vector(penv.world_to_env, ray_diff.dir_dy)
    x2z2 = vm.square(local_dir[..., 0]) + vm.square(local_dir[..., 2])
    x2z2_ok = x2z2 > 1e-12
    x2z2s = jnp.where(x2z2_ok, x2z2, 1.0)
    du_dx_ = local_dir[..., 0] / (2.0 * jnp.pi * x2z2s)
    du_dz_ = local_dir[..., 2] / (2.0 * jnp.pi * x2z2s)
    du_dxy = jnp.stack(
        [
            du_dx_ * ldx[..., 0] + du_dz_ * ldx[..., 2],
            du_dx_ * ldy[..., 0] + du_dz_ * ldy[..., 2],
        ],
        axis=-1,
    )
    one_m_y2 = 1.0 - vm.square(local_dir[..., 1])
    y_ok = one_m_y2 > 1e-12
    dv_dy_ = -1.0 / (jnp.pi * jnp.sqrt(jnp.where(y_ok, one_m_y2, 1.0)))
    dv_dxy = jnp.stack([dv_dy_ * ldx[..., 1], dv_dy_ * ldy[..., 1]], axis=-1)
    singular = ~(x2z2_ok & y_ok)
    du_dxy = jnp.where(singular[..., None], 0.0, du_dxy)
    dv_dxy = jnp.where(singular[..., None], 0.0, dv_dxy)
    return texture_eval(penv.ptex, uv, du_dxy, dv_dxy)


def _tent_inv_cdf(x):
    """Inverse CDF of the tent filter (src/envmap.h:203-210):
    x < 0.5 -> 1 - sqrt(2x);  else sqrt(2x - 0.5) - 1."""
    lo = 1.0 - vm.safe_sqrt(2.0 * x)
    hi = vm.safe_sqrt(jnp.maximum(2.0 * x - 0.5, 0.0)) - 1.0
    return jnp.where(x < 0.5, lo, hi)


def envmap_sample(penv: PackedEnvmap, sample):
    """Importance-sample a direction (src/envmap.h:212-246).

    sample: (..., 2) uniforms. Returns world-space directions (..., 3).
    """
    h = penv.base_height
    w = penv.base_width
    sy = sample[..., 1]
    sx = sample[..., 0]
    y_pos = jnp.clip(
        vm.searchsorted_right(penv.sample_cdf_ys, sy) - 1, 0, h - 1
    )
    cdf_y0 = penv.sample_cdf_ys[y_pos]
    cdf_y1 = jnp.where(y_pos < h - 1, penv.sample_cdf_ys[jnp.minimum(y_pos + 1, h - 1)], 1.0)
    sy = vm.safe_div(sy - cdf_y0, cdf_y1 - cdf_y0)
    row_cdf = penv.sample_cdf_xs[y_pos]  # (..., W)
    x_pos = jnp.clip(
        vm.searchsorted_right(row_cdf, sx) - 1,
        0,
        w - 1,
    )
    cdf_x0 = jnp.take_along_axis(row_cdf, x_pos[..., None], axis=-1)[..., 0]
    cdf_x1 = jnp.where(
        x_pos < w - 1,
        jnp.take_along_axis(
            row_cdf, jnp.minimum(x_pos + 1, w - 1)[..., None], axis=-1
        )[..., 0],
        1.0,
    )
    sx = vm.safe_div(sx - cdf_x0, cdf_x1 - cdf_x0)
    u = x_pos.astype(sample.dtype) + _tent_inv_cdf(sx)
    v = y_pos.astype(sample.dtype) + _tent_inv_cdf(sy)
    phi = (2.0 * jnp.pi / w) * (u + 0.5)
    theta = (jnp.pi / h) * (v + 0.5)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    local_dir = jnp.stack([sp * st, ct, -cp * st], axis=-1)
    return xf.xfm_vector(penv.env_to_world, local_dir)


def envmap_pdf(penv: PackedEnvmap, dir):
    """Solid-angle pdf of envmap_sample (src/envmap.h:249-306)."""
    h = penv.base_height
    w = penv.base_width
    local_dir = xf.xfm_vector(penv.world_to_env, dir)
    uv = _dir_to_uv(vm.normalize(local_dir))
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    xfi = jnp.mod(jnp.floor(x).astype(jnp.int32), w)
    yfi = jnp.mod(jnp.floor(y).astype(jnp.int32), h)
    xci = jnp.mod(xfi + 1, w)
    yci = jnp.mod(yfi + 1, h)
    dx = jnp.mod(x - jnp.floor(x), 1.0)
    dy = jnp.mod(y - jnp.floor(y), 1.0)
    lum = penv.base_luminance
    lum_ff = lum[yfi, xfi]
    lum_cf = lum[yfi, xci]
    lum_fc = lum[yci, xfi]
    lum_cc = lum[yci, xci]
    lum_fy = lum_ff * (1 - dx) * (1 - dy) + lum_cf * dx * (1 - dy)
    lum_cy = lum_fc * (1 - dx) * dy + lum_cc * dx * dy
    nl = vm.normalize(local_dir)
    sin_theta = vm.safe_sqrt(1.0 - vm.square(nl[..., 1]))
    ok = sin_theta > 0
    sin_fy = jnp.abs(jnp.sin(jnp.pi * (yfi.astype(x.dtype) + 0.5) / h))
    sin_cy = jnp.abs(jnp.sin(jnp.pi * (yci.astype(x.dtype) + 0.5) / h))
    pdf = penv.pdf_norm * jnp.abs(lum_fy * sin_fy + lum_cy * sin_cy) / jnp.where(
        ok, sin_theta, 1.0
    )
    return jnp.where(ok, pdf, 0.0)
