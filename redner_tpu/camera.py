"""Camera models: perspective, orthographic, fisheye (equi-angular), panorama,
with optional Brown-Conrady lens distortion.

TPU-native re-design of the reference camera stack (src/camera.h:122-197,
src/camera_distortion.h:7-80,173-198, pyredner/camera.py).  The camera is an
immutable differentiable pytree; ray generation is a batched pure function
over a (pixels, 2) screen-position array instead of a per-thread kernel.

Conventions (identical to the reference):
  * screen space is [0,1]^2 with x right, y down;
  * film plane mapping: [0,1]^2 -> [-1,1] x [1,-1]/aspect, aspect = W/H;
  * cam_to_world columns are (right, up, forward, position);
  * the local forward axis is +z.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from redner_tpu.core import transform as xf
from redner_tpu.core import vecmath as vm
from redner_tpu.core.types import Ray, RayDifferential


class CameraType(enum.Enum):
    perspective = 0
    orthographic = 1
    fisheye = 2
    panorama = 3


@struct.dataclass
class Camera:
    # Differentiable leaves
    position: jnp.ndarray  # (3,)
    look_at: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    cam_to_world: jnp.ndarray  # (4,4), only used when not use_look_at
    world_to_cam: jnp.ndarray  # (4,4)
    intrinsic_mat: jnp.ndarray  # (3,3)
    intrinsic_mat_inv: jnp.ndarray  # (3,3)
    distortion_params: jnp.ndarray  # (8,) k1..k6, p1, p2

    # Static configuration.  NOTE: has_distortion gates the distortion
    # math at TRACE time (the iterative inverse is expensive when unused),
    # so `cam.replace(distortion_params=p)` on a camera built without
    # distortion must also pass has_distortion=True.
    use_look_at: bool = struct.field(pytree_node=False, default=True)
    has_distortion: bool = struct.field(pytree_node=False, default=False)
    camera_type: CameraType = struct.field(
        pytree_node=False, default=CameraType.perspective
    )
    resolution: Tuple[int, int] = struct.field(
        pytree_node=False, default=(256, 256)
    )  # (height, width)
    viewport: Tuple[int, int, int, int] = struct.field(
        pytree_node=False, default=None
    )  # (top, left, bottom, right), exclusive
    clip_near: float = struct.field(pytree_node=False, default=1e-4)

    @property
    def height(self):
        return self.resolution[0]

    @property
    def width(self):
        return self.resolution[1]

    @property
    def viewport_or_full(self):
        if self.viewport is None:
            return (0, 0, self.height, self.width)
        return self.viewport

    @property
    def fov(self):
        """Recover fov (degrees) from the intrinsic matrix."""
        import math

        return jnp.arctan(1.0 / self.intrinsic_mat[0, 0]) * 2.0 * 180.0 / math.pi


def make_camera(
    position: Optional[jnp.ndarray] = None,
    look_at: Optional[jnp.ndarray] = None,
    up: Optional[jnp.ndarray] = None,
    fov: Optional[jnp.ndarray] = None,
    clip_near: float = 1e-4,
    resolution: Tuple[int, int] = (256, 256),
    viewport: Optional[Tuple[int, int, int, int]] = None,
    cam_to_world: Optional[jnp.ndarray] = None,
    intrinsic_mat: Optional[jnp.ndarray] = None,
    distortion_params: Optional[jnp.ndarray] = None,
    camera_type: CameraType = CameraType.perspective,
    dtype=jnp.float32,
) -> Camera:
    """Build a Camera pytree (mirrors pyredner/camera.py:64-125 semantics)."""
    use_look_at = cam_to_world is None
    if use_look_at:
        assert position is not None and look_at is not None and up is not None
        position = jnp.asarray(position, dtype)
        look_at = jnp.asarray(look_at, dtype)
        up = jnp.asarray(up, dtype)
        c2w = xf.look_at_matrix(position, look_at, up)
        w2c = jnp.linalg.inv(c2w)
    else:
        c2w = jnp.asarray(cam_to_world, dtype)
        w2c = jnp.linalg.inv(c2w)
        position = c2w[:3, 3]
        look_at = position + c2w[:3, 2]
        up = c2w[:3, 1]
    if intrinsic_mat is None:
        if camera_type == CameraType.perspective:
            fov = jnp.asarray(fov, dtype).reshape(())
            fov_factor = 1.0 / jnp.tan(xf.radians(0.5 * fov))
            intrinsic_mat = jnp.diag(
                jnp.stack([fov_factor, fov_factor, jnp.ones((), dtype)])
            )
        else:
            intrinsic_mat = jnp.eye(3, dtype=dtype)
    else:
        intrinsic_mat = jnp.asarray(intrinsic_mat, dtype)
    has_distortion = distortion_params is not None
    if distortion_params is None:
        distortion_params = jnp.zeros((8,), dtype)
    else:
        distortion_params = jnp.asarray(distortion_params, dtype)
    return Camera(
        position=position,
        look_at=look_at,
        up=up,
        cam_to_world=c2w,
        world_to_cam=w2c,
        intrinsic_mat=intrinsic_mat,
        intrinsic_mat_inv=jnp.linalg.inv(intrinsic_mat),
        distortion_params=distortion_params,
        use_look_at=use_look_at,
        has_distortion=has_distortion,
        camera_type=camera_type,
        resolution=tuple(resolution),
        viewport=tuple(viewport) if viewport is not None else None,
        clip_near=float(clip_near),
    )


def camera_to_world(camera: Camera) -> jnp.ndarray:
    """cam_to_world, differentiable through (position, look_at, up) when in
    look-at mode — replaces the reference's d_look_at_matrix adjoint."""
    if camera.use_look_at:
        return xf.look_at_matrix(camera.position, camera.look_at, camera.up)
    return camera.cam_to_world


# ------------------------------------------------------------------
# Brown-Conrady distortion (src/camera_distortion.h:19-84)
# ------------------------------------------------------------------


def distort(params: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Apply the rational Brown-Conrady model to screen positions (..., 2)."""
    k = params[:6]
    p = params[6:8]
    x = 2.0 * (pos[..., 0] - 0.5)
    y = 2.0 * (pos[..., 1] - 0.5)
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k[0] * r2 + k[1] * r4 + k[2] * r6
    den = 1.0 + k[3] * r2 + k[4] * r4 + k[5] * r6
    rr = num / den
    xx = x * rr + 2.0 * p[0] * x * y + p[1] * (r2 + 2.0 * x * x)
    yy = y * rr + p[0] * (r2 + 2.0 * y * y) + 2.0 * p[1] * x * y
    return jnp.stack([(xx + 1.0) * 0.5, (yy + 1.0) * 0.5], axis=-1)


def inverse_distort(params: jnp.ndarray, pos: jnp.ndarray, n_iters: int = 20):
    """Invert `distort` by Gauss-Newton (src/camera_distortion.h:173-198).

    The iteration runs under stop_gradient; one final implicit-function-
    theorem Newton step is differentiable, giving exact first-order
    sensitivities to both `pos` and `params` (replacing d_inverse_distort).
    """

    def newton_step(par, res):
        f = lambda r: distort(par, r)
        val, jvp_x = jax.jvp(f, (res,), (jnp.ones_like(res) * 0.0,))
        # Build the 2x2 Jacobian with two jvps along screen axes.
        ex = jnp.broadcast_to(jnp.array([1.0, 0.0], res.dtype), res.shape)
        ey = jnp.broadcast_to(jnp.array([0.0, 1.0], res.dtype), res.shape)
        _, jx = jax.jvp(f, (res,), (ex,))
        _, jy = jax.jvp(f, (res,), (ey,))
        residual = val - pos
        det = jx[..., 0] * jy[..., 1] - jx[..., 1] * jy[..., 0]
        # Sign-preserving det floor: near a fold of the distortion model
        # (some k during optimization make it non-invertible at the
        # screen edge) det -> 0 and a raw 1/det overflows f32 in the
        # IFT derivative — one such lane's NaN partial then poisons the
        # WHOLE d(image)/d(params) via NaN * 0 cotangent accumulation.
        inv_det = vm.guarded_div(jnp.ones_like(det), det, 1e-6)
        dx = inv_det * (jy[..., 1] * residual[..., 0] - jx[..., 1] * residual[..., 1])
        dy = inv_det * (-jy[..., 0] * residual[..., 0] + jx[..., 0] * residual[..., 1])
        return res - jnp.stack([dx, dy], axis=-1)

    result = pos
    fixed = jax.lax.stop_gradient
    for _ in range(n_iters):
        # Clamp every iterate: for non-invertible k (fold inside the
        # screen) the Gauss-Newton runs away, the distortion polynomial
        # overflows, and result becomes NaN — which the value path then
        # launders through int level-casts while the GRADIENT path keeps
        # NaN and (via NaN * 0 cotangents) poisons d(image)/d(params)
        # for the whole frame.  The screen domain is [0,1]^2; clamping
        # far outside it touches only lanes whose inverse does not
        # exist, and nan_to_num catches a NaN mid-iteration.
        result = jnp.clip(
            jnp.nan_to_num(newton_step(fixed(params), fixed(result))),
            -10.0, 11.0,
        )
    result = fixed(result)
    # Differentiable refinement step (implicit function theorem).
    return newton_step(params, result)


def _maybe_inverse_distort(camera: Camera, screen_pos):
    if camera.has_distortion:
        return inverse_distort(camera.distortion_params, screen_pos)
    return screen_pos


# ------------------------------------------------------------------
# Primary ray generation (src/camera.h:122-197, src/camera.cpp:8-43)
# ------------------------------------------------------------------


def sample_primary(camera: Camera, screen_pos: jnp.ndarray) -> Ray:
    """Generate world-space rays for screen positions (..., 2) in [0,1]^2."""
    c2w = camera_to_world(camera)
    pos = _maybe_inverse_distort(camera, screen_pos)
    aspect = camera.width / camera.height
    batch = screen_pos.shape[:-1]
    dtype = screen_pos.dtype
    ct = camera.camera_type
    if ct == CameraType.perspective:
        org = jnp.broadcast_to(xf.xfm_point(c2w, jnp.zeros((3,), dtype)), batch + (3,))
        pt = jnp.stack(
            [
                (pos[..., 0] - 0.5) * 2.0,
                (pos[..., 1] - 0.5) * (-2.0) / aspect,
                jnp.ones(batch, dtype),
            ],
            axis=-1,
        )
        local_dir = vm.normalize(xf.mat3_apply(camera.intrinsic_mat_inv, pt))
        world_dir = vm.normalize(xf.xfm_vector(c2w, local_dir))
        return Ray.make(org, world_dir)
    elif ct == CameraType.orthographic:
        pt = jnp.stack(
            [
                (pos[..., 0] - 0.5) * 2.0,
                (pos[..., 1] - 0.5) * (-2.0) / aspect,
                jnp.zeros(batch, dtype),
            ],
            axis=-1,
        )
        org = xf.xfm_point(c2w, xf.mat3_apply(camera.intrinsic_mat_inv, pt))
        d = vm.normalize(xf.xfm_vector(c2w, jnp.array([0.0, 0.0, 1.0], dtype)))
        return Ray.make(org, jnp.broadcast_to(d, org.shape))
    elif ct == CameraType.fisheye:
        org = jnp.broadcast_to(xf.xfm_point(c2w, jnp.zeros((3,), dtype)), batch + (3,))
        x = 2.0 * (pos[..., 0] - 0.5)
        y = 2.0 * (pos[..., 1] - 0.5)
        r2 = x * x + y * y
        inside = r2 <= 1.0
        r = vm.safe_sqrt(r2)
        phi = jnp.arctan2(y, jnp.where(jnp.abs(x) + jnp.abs(y) > 0, x, 1.0))
        theta = r * (jnp.pi / 2.0)
        st, ct_ = jnp.sin(theta), jnp.cos(theta)
        local_dir = jnp.stack(
            [-jnp.cos(phi) * st, -jnp.sin(phi) * st, ct_], axis=-1
        )
        world_dir = vm.normalize(xf.xfm_vector(c2w, local_dir))
        # Outside the image circle: zero direction marks an invalid ray
        # (reference drops these from the worklist, src/camera.h:160-163).
        world_dir = jnp.where(inside[..., None], world_dir, 0.0)
        return Ray.make(org, world_dir)
    elif ct == CameraType.panorama:
        org = jnp.broadcast_to(xf.xfm_point(c2w, jnp.zeros((3,), dtype)), batch + (3,))
        theta = jnp.pi * pos[..., 1]
        phi = 2.0 * jnp.pi * pos[..., 0]
        st = jnp.sin(theta)
        local_dir = jnp.stack(
            [jnp.cos(phi) * st, jnp.cos(theta), jnp.sin(phi) * st], axis=-1
        )
        world_dir = vm.normalize(xf.xfm_vector(c2w, local_dir))
        return Ray.make(org, world_dir)
    else:
        raise ValueError(f"unknown camera type {ct}")


def sample_primary_rays(camera: Camera, jitter: jnp.ndarray,
                        pixel_order=None):
    """Rays + ray differentials for every viewport pixel.

    jitter: (num_pixels, 2) in [0,1)^2 (0.5 for pixel centers).
    pixel_order: optional (num_pixels,) permutation — lane k generates the
    ray of viewport-flat pixel pixel_order[k] (tile swizzling for ray
    coherence).
    Ray differentials follow the reference's finite-difference construction
    with delta=1e-3 and half-pixel scaling (src/camera.cpp:8-43).
    Returns (Ray, RayDifferential) with batch shape (num_pixels,).
    """
    top, left, bottom, right = camera.viewport_or_full
    vw = right - left
    vh = bottom - top
    n = vw * vh
    dtype = jitter.dtype
    if pixel_order is None:
        idx = jnp.arange(n, dtype=jnp.int32)
    else:
        idx = jnp.asarray(pixel_order, jnp.int32)
    px = (idx % vw + left).astype(dtype)
    py = (idx // vw + top).astype(dtype)
    screen_pos = jnp.stack(
        [
            (px + jitter[..., 0]) / camera.width,
            (py + jitter[..., 1]) / camera.height,
        ],
        axis=-1,
    )
    ray = sample_primary(camera, screen_pos)
    delta = 1e-3
    ray_dx = sample_primary(camera, screen_pos + jnp.array([delta, 0.0], dtype))
    ray_dy = sample_primary(camera, screen_pos + jnp.array([0.0, delta], dtype))
    psx = 0.5 / camera.width
    psy = 0.5 / camera.height
    ray_diff = RayDifferential(
        org_dx=psx * (ray_dx.org - ray.org) / delta,
        org_dy=psy * (ray_dy.org - ray.org) / delta,
        dir_dx=psx * (ray_dx.dir - ray.dir) / delta,
        dir_dy=psy * (ray_dy.dir - ray.dir) / delta,
    )
    return ray, ray_diff


# ------------------------------------------------------------------
# Projection (world point -> screen), needed by primary edge sampling
# (src/camera.h:731-900 `project` / `screen_to_camera` / `camera_to_screen`)
# ------------------------------------------------------------------


def camera_to_screen(camera: Camera, pt_cam: jnp.ndarray):
    """Camera-space point -> screen [0,1]^2 (+ a validity mask)."""
    aspect = camera.width / camera.height
    ct = camera.camera_type
    if ct == CameraType.perspective:
        depth_ok = pt_cam[..., 2] > 0.0
        z = jnp.where(depth_ok, pt_cam[..., 2], 1.0)
        proj = xf.mat3_apply(camera.intrinsic_mat, pt_cam / z[..., None])
        x = proj[..., 0] * 0.5 + 0.5
        y = proj[..., 1] * (-0.5) * aspect + 0.5
        screen = jnp.stack([x, y], axis=-1)
        valid = depth_ok
    elif ct == CameraType.orthographic:
        proj = xf.mat3_apply(camera.intrinsic_mat, pt_cam)
        x = proj[..., 0] * 0.5 + 0.5
        y = proj[..., 1] * (-0.5) * aspect + 0.5
        screen = jnp.stack([x, y], axis=-1)
        valid = jnp.ones(screen.shape[:-1], bool)
    elif ct == CameraType.fisheye:
        d = vm.normalize(pt_cam)
        cos_theta = d[..., 2]
        theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + 1e-6, 1.0 - 1e-6))
        r = theta * 2.0 / jnp.pi
        phi = jnp.arctan2(-d[..., 1], -d[..., 0])
        x = 0.5 * (r * jnp.cos(phi) + 1.0)
        y = 0.5 * (r * jnp.sin(phi) + 1.0)
        screen = jnp.stack([x, y], axis=-1)
        valid = jnp.ones(screen.shape[:-1], bool)
    elif ct == CameraType.panorama:
        d = vm.normalize(pt_cam)
        theta = jnp.arccos(jnp.clip(d[..., 1], -1.0 + 1e-6, 1.0 - 1e-6))
        phi = jnp.arctan2(d[..., 2], d[..., 0])
        phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
        screen = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)
        valid = jnp.ones(screen.shape[:-1], bool)
    else:
        raise ValueError(f"unknown camera type {ct}")
    if camera.has_distortion:
        screen = distort(camera.distortion_params, screen)
    return screen, valid


def project(camera: Camera, p_world: jnp.ndarray):
    """World point -> screen [0,1]^2 with clip-plane validity (edge PMFs)."""
    w2c = jnp.linalg.inv(camera_to_world(camera)) if camera.use_look_at else camera.world_to_cam
    pt_cam = xf.xfm_point(w2c, p_world)
    screen, valid = camera_to_screen(camera, pt_cam)
    if camera.camera_type in (CameraType.perspective, CameraType.orthographic):
        valid = valid & (pt_cam[..., 2] > camera.clip_near)
    return screen, valid, pt_cam


# ------------------------------------------------------------------
# Camera utilities (pyredner/camera.py:193-268)
# ------------------------------------------------------------------


def automatic_camera_placement(shapes, resolution, fov_deg=45.0,
                               dtype=jnp.float32) -> Camera:
    """Place a camera that frames all given shapes/objects
    (reference pyredner.automatic_camera_placement, pyredner/camera.py:193-233).
    """
    vs = [s.vertices for s in shapes]
    allv = jnp.concatenate(vs, axis=0).astype(dtype)
    vmin = jnp.min(allv, axis=0)
    vmax = jnp.max(allv, axis=0)
    center = 0.5 * (vmin + vmax)
    radius = 0.5 * float(jnp.max(vmax - vmin)) + 1e-6
    fov = jnp.asarray(fov_deg, dtype)
    distance = radius / jnp.tan(xf.radians(0.5 * fov)) * 2.0
    position = center + jnp.asarray([0.0, 0.0, -1.0], dtype) * distance
    return make_camera(
        position=position,
        look_at=center,
        up=jnp.asarray([0.0, 1.0, 0.0], dtype),
        fov=fov,
        resolution=resolution,
        dtype=dtype,
    )


def generate_intrinsic_mat(fx, fy, skew, x0, y0, dtype=jnp.float32):
    """3x3 intrinsic matrix from the five standard parameters
    (reference pyredner.generate_intrinsic_mat, pyredner/camera.py:234-268)."""
    fx = jnp.asarray(fx, dtype)
    fy = jnp.asarray(fy, dtype)
    skew = jnp.asarray(skew, dtype)
    x0 = jnp.asarray(x0, dtype)
    y0 = jnp.asarray(y0, dtype)
    z = jnp.zeros((), dtype)
    o = jnp.ones((), dtype)
    return jnp.stack([
        jnp.stack([fx, skew, x0]),
        jnp.stack([z, fy, y0]),
        jnp.stack([z, z, o]),
    ])
