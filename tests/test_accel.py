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
