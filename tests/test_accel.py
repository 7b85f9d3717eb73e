"""Acceleration-structure equivalence: all engines must agree on hits
(reference treats Embree CPU as the golden reference for OptiX,
SURVEY §4 tier 3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from redner_tpu import accel
from redner_tpu.core.types import Ray
from redner_tpu.ops.cluster import intersect_clustered, occluded_clustered
from redner_tpu.ops.intersect import intersect_mm, occluded_mm
from redner_tpu.scene import flatten_scene
from tests.scene_util import shadow_scene


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    org = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(
        org=org, dir=d,
        tmin=jnp.full((n,), 1e-3), tmax=jnp.full((n,), jnp.inf),
    )


@pytest.fixture(scope="module")
def fs():
    return flatten_scene(shadow_scene())


def test_mm_matches_bruteforce(fs):
    ray = _random_rays(512)
    a = accel.intersect_bruteforce(fs, ray)
    b = intersect_mm(fs, ray)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    finite = np.isfinite(np.asarray(a.t))
    np.testing.assert_allclose(
        np.asarray(a.t)[finite], np.asarray(b.t)[finite], rtol=1e-4
    )


def test_cluster_matches_mm(fs):
    ray = _random_rays(512, seed=1)
    a = intersect_mm(fs, ray)
    b = intersect_clustered(fs, ray)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))


def test_occluded_engines_agree(fs):
    ray = _random_rays(512, seed=2)
    a = accel.occluded_bruteforce(fs, ray)
    b = occluded_mm(fs, ray)
    c = occluded_clustered(fs, ray)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_degenerate_rays_miss(fs):
    n = 8
    ray = Ray(
        org=jnp.zeros((n, 3)),
        dir=jnp.zeros((n, 3)),  # zero dir marks invalid (active_pixels.cpp:8-15)
        tmin=jnp.zeros((n,)),
        tmax=jnp.full((n,), jnp.inf),
    )
    for fn in (accel.intersect_bruteforce, intersect_mm, intersect_clustered):
        isect = fn(fs, ray)
        assert not bool(jnp.any(isect.valid))
    for fn in (accel.occluded_bruteforce, occluded_mm, occluded_clustered):
        assert not bool(jnp.any(fn(fs, ray)))


def test_pallas_kernel_matches_mm_interpret(fs):
    """Fused Pallas kernel vs the XLA matmul path (interpret mode on CPU)."""
    from redner_tpu.ops.pallas_intersect import (intersect_pallas,
                                                 occluded_pallas)

    ray = _random_rays(700, seed=3)  # non-multiple of the tile size
    a = intersect_mm(fs, ray)
    b = intersect_pallas(fs, ray, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    occ_a = occluded_mm(fs, ray)
    occ_b = occluded_pallas(fs, ray, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def test_large_scene_cluster_dispatch_renders():
    """>16k-triangle scenes route to the clustered engine inside a real
    render (accel.py dispatch) and stay finite."""
    import sys

    import redner_tpu as rt

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_scene

    scene = _flagship_scene(res=(8, 8), n_seg=92)  # 2*92*184 > 16384 tris
    fs2 = flatten_scene(scene)
    assert fs2.num_triangles > accel.MM_MAX_TRIS
    img = rt.render_image(
        scene, rt.RenderOptions(num_samples=1, max_bounces=1), seed=0
    )
    assert bool(jnp.all(jnp.isfinite(img)))
    assert float(img.sum()) > 0


def test_pallas_kernel_large_scene_interpret():
    """>MM_MAX_TRIS scenes run the Pallas engine on TPU (accel.py
    PALLAS_MAX_TRIS); its culled sweep must agree with the clustered
    engine at that scale (interpret mode on CPU)."""
    import sys

    from redner_tpu.ops.pallas_intersect import (intersect_pallas,
                                                 occluded_pallas)

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_scene

    scene = _flagship_scene(res=(8, 8), n_seg=92)
    fs2 = flatten_scene(scene)
    assert fs2.num_triangles > accel.MM_MAX_TRIS
    ray = _random_rays(600, seed=7)
    a = intersect_clustered(fs2, ray)
    b = intersect_pallas(fs2, ray, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    occ_a = occluded_clustered(fs2, ray)
    occ_b = occluded_pallas(fs2, ray, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def _on_geometry_rays(fs, n, seed=5):
    """Rays whose origins lie ON scene geometry (bounce/shadow style) —
    the phantom-self-hit population the prescreen must route to the
    exact confirm (PERF.md r3 bf16 analysis)."""
    rng = np.random.default_rng(seed)
    f = np.asarray(fs.faces)
    v = np.asarray(fs.vertices)
    tri = rng.integers(0, f.shape[0], n)
    b = rng.dirichlet([1.0, 1.0, 1.0], n).astype(np.float32)
    p = (
        b[:, :1] * v[f[tri, 0]]
        + b[:, 1:2] * v[f[tri, 1]]
        + b[:, 2:3] * v[f[tri, 2]]
    )
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(
        org=jnp.asarray(p), dir=jnp.asarray(d),
        tmin=jnp.full((n,), 1e-3), tmax=jnp.full((n,), jnp.inf),
    )


def _straddle_pairs(scale=1.0, n=64, seed=6):
    """±1e-5 offset-ray pairs straddling a quad's silhouette edge at the
    given coordinate scale (the edge-sampling classification workload;
    large-scale variant covers the ADVICE split4-error-floor concern)."""
    import redner_tpu as rt
    from redner_tpu.core import vecmath as vm

    s = scale
    quad = rt.make_shape(
        vertices=[[-0.6 * s, 1.2 * s, -0.5 * s], [0.6 * s, 1.2 * s, -0.5 * s],
                  [-0.6 * s, 1.2 * s, 0.7 * s], [0.6 * s, 1.2 * s, 0.7 * s]],
        indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
    cam = rt.make_camera(position=[0., 3. * s, -6. * s],
                         look_at=[0., 0., 0.], up=[0., 1., 0.],
                         fov=45.0, resolution=(4, 4))
    scene = rt.make_scene(
        cam, [quad], [rt.make_material(diffuse_reflectance=[0.5] * 3)])
    fsq = flatten_scene(scene)
    t = jnp.linspace(0.2, 0.8, n)
    av = jnp.asarray([0.6 * s, 1.2 * s, -0.5 * s])
    bv = jnp.asarray([0.6 * s, 1.2 * s, 0.7 * s])
    x_edge = (1 - t)[:, None] * av + t[:, None] * bv
    p = jnp.stack([jnp.linspace(0.9, 1.1, n) * s, jnp.zeros(n),
                   jnp.full(n, 0.2 * s)], -1)
    omega = vm.normalize(x_edge - p)
    dxdt = jnp.broadcast_to(bv - av, (n, 3))
    n_hat = vm.normalize(jnp.cross(omega, vm.normalize(
        dxdt - omega * jnp.sum(omega * dxdt, -1, keepdims=True))))
    d2 = jnp.concatenate([vm.normalize(omega + 1e-5 * n_hat),
                          vm.normalize(omega - 1e-5 * n_hat)])
    ray = Ray(org=jnp.concatenate([p, p]), dir=d2,
              tmin=jnp.full((2 * n,), 1e-3 * s),
              tmax=jnp.full((2 * n,), jnp.inf))
    return fsq, ray


def _assert_prescreen_matches_split4(fsx, ray):
    from redner_tpu.ops.pallas_intersect import (intersect_pallas,
                                                 occluded_pallas)

    a = intersect_pallas(fsx, ray, interpret=True, precise="split4")
    b = intersect_pallas(fsx, ray, interpret=True, precise="prescreen")
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    # Confirmed steps reproduce split4 bit-exactly; skipped steps are
    # proven hit-free — so t must agree to the BIT, not a tolerance.
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    occ_a = occluded_pallas(fsx, ray, interpret=True, precise="split4")
    occ_b = occluded_pallas(fsx, ray, interpret=True, precise="prescreen")
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def test_prescreen_matches_split4_random(fs):
    _assert_prescreen_matches_split4(fs, _random_rays(700, seed=13))


def test_prescreen_matches_split4_on_geometry(fs):
    """On-geometry origins: the self-surface appears at |t| ~ bf16 noise;
    the widened t-band must flag it ambiguous, the confirm reject it."""
    _assert_prescreen_matches_split4(fs, _on_geometry_rays(fs, 600))


@pytest.mark.parametrize("scale", [1.0, 1000.0])
def test_prescreen_straddle_pairs(scale):
    """Edge-sampling offset pairs must classify differently per side, and
    identically to split4, at toy AND large coordinate scales."""
    fsq, ray = _straddle_pairs(scale=scale)
    _assert_prescreen_matches_split4(fsq, ray)
    from redner_tpu.ops.pallas_intersect import intersect_pallas

    isect = intersect_pallas(fsq, ray, interpret=True, precise=True)
    hits = np.asarray(isect.valid)
    n = hits.shape[0] // 2
    assert np.mean(hits[:n] != hits[n:]) > 0.8


@pytest.mark.parametrize("mode,ref_mode", [("fused4", "split4"),
                                           ("fused9", "highest")])
def test_fused_modes_match_multipass(fs, mode, ref_mode):
    """One-pass K-stacked split matmuls must reproduce their multi-pass
    equivalents: fused4 ~ split4 (same 4 products, one f32 accumulator),
    fused9 ~ full-f32 (exact 3-way bf16 split)."""
    from redner_tpu.ops.pallas_intersect import (intersect_pallas,
                                                 occluded_pallas)

    for ray in (_random_rays(700, seed=23), _on_geometry_rays(fs, 600)):
        a = intersect_pallas(fs, ray, interpret=True, precise=ref_mode)
        b = intersect_pallas(fs, ray, interpret=True, precise=mode)
        np.testing.assert_array_equal(np.asarray(a.tri_id),
                                      np.asarray(b.tri_id))
        fin = np.isfinite(np.asarray(a.t))
        np.testing.assert_allclose(np.asarray(b.t)[fin],
                                   np.asarray(a.t)[fin], rtol=1e-5)
        occ_a = occluded_pallas(fs, ray, interpret=True, precise=ref_mode)
        occ_b = occluded_pallas(fs, ray, interpret=True, precise=mode)
        np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


@pytest.mark.parametrize("mode", ["fused4", "fused9"])
@pytest.mark.parametrize("scale", [1.0, 1000.0])
def test_fused_modes_straddle(mode, scale):
    from redner_tpu.ops.pallas_intersect import intersect_pallas

    fsq, ray = _straddle_pairs(scale=scale)
    isect = intersect_pallas(fsq, ray, interpret=True, precise=mode)
    hits = np.asarray(isect.valid)
    n = hits.shape[0] // 2
    assert np.mean(hits[:n] != hits[n:]) > 0.8


def test_prescreen_error_bound_sound(fs):
    """The widened-band eps must dominate the actual bf16 base error:
    |f64_exact - bf16_base| <= eps for every (ray, tri) pair."""
    from redner_tpu.ops.intersect import ray_features, triangle_coefficients
    from redner_tpu.ops.pallas_intersect import PRESCREEN_ERR

    rng = np.random.default_rng(17)
    n = 256
    org = rng.normal(0, 3, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    R = np.asarray(ray_features(jnp.asarray(org), jnp.asarray(d)))
    f = np.asarray(fs.faces)
    v = np.asarray(fs.vertices)
    T = np.asarray(
        triangle_coefficients(
            jnp.asarray(v[f[:, 0]]), jnp.asarray(v[f[:, 1]]),
            jnp.asarray(v[f[:, 2]])
        )
    )  # (F, 10, 4)
    Tm = T.transpose(1, 0, 2).reshape(10, -1)  # (10, 4F) group-interleaved
    Rb = jnp.asarray(R).astype(jnp.bfloat16)
    Tb = jnp.asarray(Tm).astype(jnp.bfloat16)
    base = np.asarray(
        jnp.dot(Rb, Tb, preferred_element_type=jnp.float32)
    )
    exact = R.astype(np.float64) @ Tm.astype(np.float64)
    err = np.abs(exact - base)
    # eps via the group-structured Cauchy-Schwarz bound: Tm columns are
    # (tri, group)-interleaved — group g = col % 4 (0 det, 1 u, 2 v, 3 t).
    cn = np.linalg.norm(Tm, axis=0)
    rn_d = np.linalg.norm(R[:, 0:3], axis=1)
    rn_uv = np.linalg.norm(R[:, 0:6], axis=1)
    rn_t = np.linalg.norm(R[:, 6:10], axis=1)
    g = np.arange(Tm.shape[1]) % 4
    rn = np.stack([rn_d, rn_uv, rn_uv, rn_t], axis=1)[:, g]  # (n, 4F)
    eps = PRESCREEN_ERR * rn * cn[None, :]
    assert np.all(err <= eps + 1e-30)


def test_pallas_presorted_matches_sorted_interpret():
    """presorted=True only skips the Morton coherence sort — hit results
    must be identical to the sorting path (render.py passes it for
    swizzled primary and bounce rays).  Needs > 8 chunks (4096 tris) or
    the sort is gated off and both paths are trivially the same."""
    import sys

    from redner_tpu.ops.pallas_intersect import (intersect_pallas,
                                                 occluded_pallas)

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_scene

    fs = flatten_scene(_flagship_scene(res=(8, 8), n_seg=40))  # 6400 tris
    assert fs.num_triangles > 8 * 512
    ray = _random_rays(700, seed=11)
    a = intersect_pallas(fs, ray, interpret=True)
    b = intersect_pallas(fs, ray, interpret=True, presorted=True)
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    finite = np.isfinite(np.asarray(a.t))
    np.testing.assert_allclose(np.asarray(a.t)[finite],
                               np.asarray(b.t)[finite], rtol=1e-5)
    occ_a = occluded_pallas(fs, ray, interpret=True)
    occ_b = occluded_pallas(fs, ray, interpret=True, presorted=True)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))
