"""Absolute radiometric correctness oracles (VERDICT r4 item 3).

Every other gradient test in the suite is SELF-consistent (edge-sampled
gradients vs finite differences of this same renderer); forward tests
check invariants.  These tests pin the renderer to CLOSED FORMS computed
independently in float64:

  1. furnace test — a convex diffuse object inside a constant-radiance
     environment map reflects exactly albedo * radiance from every
     visible point, at every bounce depth (the rendering-equation fixed
     point for unoccluded constant incident light);
  2. analytic quad-light direct illumination — per-pixel radiance of a
     diffuse floor lit by a rectangular area light equals
     rho/pi * E(p) with E given by the point-to-polygon contour formula
     (Lambert / Baum et al.), evaluated at the pixel-center hit points;
  3. analytic visibility gradient — the derivative of the image sum
     w.r.t. an occluder's translation, where the exact value is the
     float64 derivative of the CLIPPED-polygon contour formula (not a
     finite difference of the renderer): the continuous AD part of this
     derivative is identically zero, so it isolates the secondary-edge
     estimator against an exact reference.

They fill the role of the reference's convergence ladder
(tests/test_single_triangle.py:87-170) without needing the reference
binary (no Embree in this container — ROADMAP item 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu as rt


# ----------------------------------------------------------------------
# float64 closed forms
# ----------------------------------------------------------------------


def _polygon_irradiance(p, n, verts, L):
    """Irradiance at point p (normal n) from a convex polygon with
    constant radiance L: E = L/2 * sum_i theta_i * (gamma_i . n)
    (the point-to-polygon contour integral; Lambert's formula — sanity
    anchor: a polygon filling the hemisphere has sum theta (gamma.n) =
    2 pi, giving E = pi L).  float64 numpy; verts (K, 3)
    counter-clockwise seen from p."""
    p = np.asarray(p, np.float64)
    n = np.asarray(n, np.float64)
    v = np.asarray(verts, np.float64) - p
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    E = 0.0
    K = v.shape[0]
    for i in range(K):
        a, b = v[i], v[(i + 1) % K]
        cr = np.cross(a, b)
        s = np.linalg.norm(cr)
        if s < 1e-15:
            continue
        theta = np.arctan2(s, np.dot(a, b))
        E += theta * np.dot(cr / s, n)
    return L / 2.0 * E


def _polygon_irradiance_jnp(p, n, verts, L):
    """Same contour formula in jax (float64 under x64) — differentiable
    w.r.t. verts, used to get the EXACT derivative of the clipped-polygon
    form (oracle 3).  verts (K, 3)."""
    v = verts - p[None, :]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    a = v
    b = jnp.roll(v, -1, axis=0)
    cr = jnp.cross(a, b)
    s = jnp.maximum(jnp.linalg.norm(cr, axis=-1), 1e-30)
    theta = jnp.arctan2(s, jnp.sum(a * b, axis=-1))
    return L / 2.0 * jnp.sum(theta * ((cr / s[:, None]) @ n))


def _clip_topology(verts_np, c_np, d_np):
    """Sutherland-Hodgman clip of a polygon loop against
    {x : (x - c) . d >= 0}, TOPOLOGY ONLY: returns tokens ('v', i) for a
    kept vertex and ('x', i, j) for the intersection on edge i->j,
    decided with concrete float64 numbers.  The caller rebuilds the
    polygon differentiably from the tokens (the topology is locally
    constant, so fixing it at the evaluation point gives the exact
    derivative)."""
    K = len(verts_np)
    sd = [float(np.dot(verts_np[i] - c_np, d_np)) for i in range(K)]
    toks = []
    for i in range(K):
        j = (i + 1) % K
        if sd[i] >= 0:
            toks.append(("v", i))
        if (sd[i] >= 0) != (sd[j] >= 0):
            toks.append(("x", i, j))
    return toks


def _clip_build(toks, verts, c, d):
    """Differentiable polygon from _clip_topology tokens (jax)."""
    pts = []
    for t in toks:
        if t[0] == "v":
            pts.append(verts[t[1]])
        else:
            a, b = verts[t[1]], verts[t[2]]
            sa = jnp.dot(a - c, d)
            sb = jnp.dot(b - c, d)
            w = sa / (sa - sb)
            pts.append(a + w * (b - a))
    return jnp.stack(pts)


# ----------------------------------------------------------------------
# 1. furnace test
# ----------------------------------------------------------------------


@pytest.mark.parametrize("bounces", [1, 2])
def test_furnace_constant_envmap(bounces):
    rho = 0.6
    c = 1.0
    verts, idx, uvs, normals = rt.generate_sphere(24, 48)
    sph = rt.make_shape(vertices=verts, indices=idx, uvs=uvs,
                        normals=normals, material_id=0)
    cam = rt.make_camera(position=[0.0, 0.0, -4.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=45.0, resolution=(48, 48))
    env = rt.make_environment_map(np.full((16, 32, 3), c, np.float32))
    scene = rt.make_scene(
        cam, [sph], [rt.make_material(diffuse_reflectance=[rho] * 3)],
        envmap=env)
    opts = rt.RenderOptions(num_samples=128, max_bounces=bounces,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)
    img = np.asarray(rt.render_image(scene, opts, seed=3))
    # central block: pixels fully covered by the sphere (radius 1 at
    # distance 4, fov 45 -> sphere spans ~60% of the image)
    blk = img[18:30, 18:30, :3]
    mean = blk.mean()
    # A convex object in a constant envmap: every bounce ray escapes, so
    # radiance = rho * c exactly, independent of bounce depth.
    assert abs(mean - rho * c) < 4e-3, mean
    # and per-pixel: no pixel systematically off (bound = MC noise at
    # 128 spp; the block mean above is the tight absolute check)
    perpix = blk.mean(axis=-1)
    assert np.abs(perpix - rho * c).max() < 0.08, perpix


def test_furnace_three_albedos():
    verts, idx, uvs, normals = rt.generate_sphere(24, 48)
    sph = rt.make_shape(vertices=verts, indices=idx, uvs=uvs,
                        normals=normals, material_id=0)
    cam = rt.make_camera(position=[0.0, 0.0, -4.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=45.0, resolution=(32, 32))
    env = rt.make_environment_map(np.full((16, 32, 3), 2.0, np.float32))
    for rho in (0.2, 0.5, 0.9):
        scene = rt.make_scene(
            cam, [sph], [rt.make_material(diffuse_reflectance=[rho] * 3)],
            envmap=env)
        opts = rt.RenderOptions(num_samples=128, max_bounces=1,
                                use_primary_edge_sampling=False,
                                use_secondary_edge_sampling=False)
        img = np.asarray(rt.render_image(scene, opts, seed=5))
        mean = img[12:20, 12:20, :3].mean()
        assert abs(mean - 2.0 * rho) < 8e-3 * 2.0, (rho, mean)


# ----------------------------------------------------------------------
# 2. analytic quad-light direct illumination
# ----------------------------------------------------------------------


def _floor_light_scene(light_y=3.0, half=1.0, L=5.0, res=16, tx=0.0,
                       with_occluder=False, occ_x0=-0.6):
    """Camera looks straight down at a diffuse floor; a square area light
    (side 2*half, radiance L) hangs at y=light_y facing down.  Optionally
    a half-plane occluder at y=light_y/2 covering x >= occ_x0 + tx (kept
    out of the camera frustum... it IS in frustum; the camera only sees
    the floor because the occluder faces sideways?  No: keep the camera
    BELOW the occluder plane and far enough that primary rays hit the
    floor first is impossible — instead the camera sits at a slant)."""
    cam = rt.make_camera(position=[0.0, 1.0, -6.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], fov=18.0,
                         resolution=(res, res))
    floor = rt.make_shape(
        vertices=[[-8.0, 0.0, -8.0], [8.0, 0.0, -8.0],
                  [-8.0, 0.0, 8.0], [8.0, 0.0, 8.0]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    lv = np.array([[-half, light_y, -half], [half, light_y, -half],
                   [-half, light_y, half], [half, light_y, half]],
                  np.float32)
    light = rt.make_shape(vertices=lv, indices=[[0, 1, 2], [1, 3, 2]],
                          material_id=0, light_id=0)
    shapes = [floor, light]
    if with_occluder:
        y_o = light_y / 2.0
        ov = np.array([[occ_x0 + tx, y_o, -6.0], [6.0, y_o, -6.0],
                       [occ_x0 + tx, y_o, 6.0], [6.0, y_o, 6.0]],
                      np.float32)
        shapes.append(rt.make_shape(
            vertices=jnp.asarray(ov) + jnp.stack(
                [jnp.asarray(tx, jnp.float32) * 0, jnp.asarray(0.0),
                 jnp.asarray(0.0)]),
            indices=[[0, 1, 2], [1, 3, 2]], material_id=0))
    scene = rt.make_scene(
        cam, shapes, [rt.make_material(diffuse_reflectance=[0.7] * 3)],
        area_lights=[rt.make_area_light(1, [L] * 3, two_sided=True,
                                        directly_visible=False)])
    return scene, cam, lv.astype(np.float64)


def _pixel_center_floor_hits(cam_pos, look_at, fov_deg, res):
    """float64 pixel-center ray/floor (y=0) intersections for the
    straight-down-tilted camera of _floor_light_scene."""
    pos = np.asarray(cam_pos, np.float64)
    la = np.asarray(look_at, np.float64)
    fwd = la - pos
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    upv = np.cross(right, fwd)
    t = np.tan(np.deg2rad(fov_deg) / 2.0)
    hits = np.zeros((res, res, 3))
    for iy in range(res):
        for ix in range(res):
            sx = (2.0 * (ix + 0.5) / res - 1.0) * t
            sy = (1.0 - 2.0 * (iy + 0.5) / res) * t
            d = fwd + sx * right + sy * upv
            d /= np.linalg.norm(d)
            s = -pos[1] / d[1]
            hits[iy, ix] = pos + s * d
    return hits


def test_quad_light_matches_contour_formula():
    L = 5.0
    res = 16
    scene, cam, lv = _floor_light_scene(L=L, res=res)
    opts = rt.RenderOptions(num_samples=512, max_bounces=1,
                            sample_pixel_center=True,
                            use_primary_edge_sampling=False,
                            use_secondary_edge_sampling=False)
    img = np.asarray(rt.render_image(scene, opts, seed=7))[..., :3]
    hits = _pixel_center_floor_hits([0.0, 1.0, -6.0], [0.0, 0.0, 0.0],
                                    18.0, res)
    # loop order of the light quad, counter-clockwise as seen from below
    loop = lv[[0, 2, 3, 1]]
    ana = np.zeros((res, res))
    for iy in range(res):
        for ix in range(res):
            E = _polygon_irradiance(hits[iy, ix], [0.0, 1.0, 0.0], loop, L)
            ana[iy, ix] = 0.7 / np.pi * E
    rendered = img.mean(axis=-1)
    # exclude rays that leave the finite floor quad (the analytic plane
    # is infinite; the top rows graze out past |x|,|z| = 8)
    mask = (np.abs(hits[..., 0]) < 7.5) & (np.abs(hits[..., 2]) < 7.5)
    assert mask.sum() > res * res // 2
    rel = (np.abs(rendered - ana) / np.abs(ana))[mask]
    # per-pixel MC noise at 512 spp, image-mean must be tight
    assert rel.mean() < 0.02, (rel.mean(), rendered[mask].mean(),
                               ana[mask].mean())
    assert (abs(rendered[mask].mean() - ana[mask].mean())
            / ana[mask].mean() < 5e-3)
    assert rel.max() < 0.15, rel.max()


# ----------------------------------------------------------------------
# 3. analytic visibility gradient (secondary-edge oracle)
# ----------------------------------------------------------------------


def test_occluder_translation_gradient_matches_analytic():
    """d/dtx of the image sum when a half-plane occluder slides across a
    square light: the exact value is the float64 AD derivative of the
    clipped-polygon contour formula.  The renderer's continuous AD part
    is identically zero here (the occluder only blocks), so this pins
    the secondary-edge estimator to an analytic, non-FD reference."""
    L = 5.0
    res = 16
    light_y, half = 3.0, 1.0
    y_o = light_y / 2.0
    occ_x0 = -0.2

    def scene_at(tx):
        cam = rt.make_camera(position=[0.0, 1.0, -6.0],
                             look_at=[0.0, 0.0, 0.0],
                             up=[0.0, 1.0, 0.0], fov=18.0,
                             resolution=(res, res))
        floor = rt.make_shape(
            vertices=[[-8.0, 0.0, -8.0], [8.0, 0.0, -8.0],
                      [-8.0, 0.0, 8.0], [8.0, 0.0, 8.0]],
            indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
        light = rt.make_shape(
            vertices=[[-half, light_y, -half], [half, light_y, -half],
                      [-half, light_y, half], [half, light_y, half]],
            indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
        base = jnp.asarray([[occ_x0, y_o, -6.0], [6.0, y_o, -6.0],
                            [occ_x0, y_o, 6.0], [6.0, y_o, 6.0]],
                           jnp.float32)
        off = jnp.stack([tx, jnp.asarray(0.0), jnp.asarray(0.0)])
        # only the two edge vertices move (the far side is parked away)
        occ = rt.make_shape(
            vertices=base + off * jnp.asarray([[1.0], [0.0], [1.0], [0.0]]),
            indices=[[0, 1, 2], [1, 3, 2]], material_id=0)
        return rt.make_scene(
            cam, [floor, light, occ],
            [rt.make_material(diffuse_reflectance=[0.7] * 3)],
            area_lights=[rt.make_area_light(1, [L] * 3, two_sided=True,
                                            directly_visible=False)])

    opts = rt.RenderOptions(num_samples=16, max_bounces=1,
                            use_primary_edge_sampling=False)

    def loss(tx, seed):
        return jnp.sum(rt.render(scene_at(tx), opts, seed=seed))

    gfn = jax.jit(lambda seed: jax.grad(loss)(jnp.asarray(0.0), seed))
    seeds = 24
    gs = np.array([float(gfn(jnp.uint32(s))) for s in range(seeds)])

    # ----- analytic oracle in float64 -----
    from jax import config as _cfg
    hits = _pixel_center_floor_hits([0.0, 1.0, -6.0], [0.0, 0.0, 0.0],
                                    18.0, res)
    loop = np.array([[-half, light_y, -half], [half, light_y, -half],
                     [half, light_y, half], [-half, light_y, half]])

    # Per-pixel clip TOPOLOGY (fixed at tx = 0; locally constant in tx so
    # the derivative of the fixed-topology expression is exact):
    # a light point q is visible from p iff the segment p->q crosses the
    # occluder plane y = y_o at x < occ_x0 + tx.  That is a halfplane in
    # the light plane bounded by the central projection of the occluder
    # edge line; (c, d) below is an equivalent world-space halfplane
    # (plane through p and the edge line, oriented toward visibility).
    def pix_clip(p_np):
        e0_np = np.array([occ_x0, y_o, 0.0])
        e1_np = e0_np + np.array([0.0, 0.0, 1.0])
        nrm_np = np.cross(e1_np - e0_np, e0_np - p_np)
        # orient: corner visibility by the direct crossing test
        q0 = loop[0]
        t_cross = (y_o - p_np[1]) / (q0[1] - p_np[1])
        x_cross = p_np[0] + t_cross * (q0[0] - p_np[0])
        vis0 = x_cross < occ_x0
        side0 = np.dot(q0 - e0_np, nrm_np)
        sgn = 1.0 if (side0 > 0) == vis0 else -1.0
        return e0_np, sgn, _clip_topology(loop, e0_np, nrm_np * sgn)

    topos = [[pix_clip(hits[iy, ix]) for ix in range(res)]
             for iy in range(res)]

    def total_radiance(tx):
        tot = 0.0
        off = jnp.stack([tx, tx * 0.0, tx * 0.0])
        n_up = jnp.asarray([0.0, 1.0, 0.0])
        lj = jnp.asarray(loop)
        for iy in range(res):
            for ix in range(res):
                e0_np, sgn, toks = topos[iy][ix]
                if not toks:
                    continue  # fully blocked: no visible light polygon
                p = jnp.asarray(hits[iy, ix])
                e0 = jnp.asarray(e0_np) + off
                e1 = e0 + jnp.asarray([0.0, 0.0, 1.0])
                nrm = jnp.cross(e1 - e0, e0 - p)
                poly = _clip_build(toks, lj, e0, nrm * sgn)
                E = _polygon_irradiance_jnp(p, n_up, poly, L)
                # |.| absorbs the loop winding; E stays one-signed at
                # every evaluated point, so abs is smooth here.
                tot = tot + 0.7 / jnp.pi * jnp.abs(E)
        # the renderer loss sums 3 identical RGB channels
        return 3.0 * tot

    _cfg.update("jax_enable_x64", True)
    try:
        g_exact = float(jax.grad(total_radiance)(jnp.asarray(0.0,
                                                             jnp.float64)))
    finally:
        _cfg.update("jax_enable_x64", False)

    se = gs.std() / np.sqrt(seeds)
    assert g_exact != 0.0
    # mean within max(3 standard errors, 10%) of the EXACT derivative
    tol = max(3.0 * se, 0.10 * abs(g_exact))
    assert abs(gs.mean() - g_exact) < tol, (
        gs.mean(), g_exact, se, gs.std())
