"""Mesh utility correctness: vertex normals, smoothing, bounds
(reference tests/test_compute_vertex_normals.py, pyredner/shape.py utils)."""

import jax.numpy as jnp
import numpy as np

import redner_tpu as rt
from redner_tpu.geometry import bound_vertices, compute_vertex_normal, smooth


def test_vertex_normals_flat_quad():
    # 'max' on an open flat mesh gives the face normal.  (The cotangent
    # scheme is a mean-curvature normal — degenerate on open flat meshes,
    # where boundary rings aren't closed; tested on the sphere below.)
    v = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [1., 1., 0.]])
    f = jnp.asarray([[0, 1, 2], [1, 3, 2]], jnp.int32)
    n = compute_vertex_normal(v, f, "max")
    np.testing.assert_allclose(
        np.asarray(n), np.tile([0., 0., 1.], (4, 1)), atol=1e-5
    )


def test_vertex_normals_cotangent_sphere():
    v, f, uvs, _ = rt.generate_sphere(12, 24)
    n = compute_vertex_normal(v, f, "cotangent")
    radial = np.asarray(v) / np.linalg.norm(np.asarray(v), axis=-1, keepdims=True)
    cos = np.abs(np.sum(np.asarray(n) * radial, axis=-1))
    interior = np.abs(np.asarray(v)[:, 1]) < 0.9
    assert (cos[interior] > 0.9).mean() > 0.9


def test_vertex_normals_sphere_radial():
    v, f, uvs, _ = rt.generate_sphere(12, 24)
    n = compute_vertex_normal(v, f, "max")
    # Away from the poles, computed normals align with the radial direction.
    radial = np.asarray(v) / np.linalg.norm(np.asarray(v), axis=-1, keepdims=True)
    cos = np.sum(np.asarray(n) * radial, axis=-1)
    interior = np.abs(np.asarray(v)[:, 1]) < 0.9
    assert (cos[interior] > 0.95).mean() > 0.95


def test_vertex_normals_degenerate_safe():
    v = jnp.asarray([[0., 0., 0.], [0., 0., 0.], [1., 0., 0.]])
    f = jnp.asarray([[0, 1, 2]], jnp.int32)
    n = compute_vertex_normal(v, f, "max")
    assert bool(jnp.all(jnp.isfinite(n)))


def test_smooth_shrinks_bump():
    v, f, uvs, _ = rt.generate_sphere(8, 16)
    bumped = v.at[40].multiply(1.5)
    sm = smooth(bumped, f, lmd=0.5)
    r_before = float(jnp.linalg.norm(bumped[40]))
    r_after = float(jnp.linalg.norm(sm[40]))
    assert r_after < r_before


def test_bound_vertices():
    v = jnp.asarray([[1., 0., 0.], [-1., 0., 0.], [0., 2., 0.]])
    center, radius = bound_vertices(v)
    assert bool(jnp.all(jnp.isfinite(center)))
    d = jnp.linalg.norm(v - center, axis=-1)
    assert float(d.max()) <= float(radius) + 1e-5


def test_weld_then_edges_shared():
    """Welding enables silhouette detection across duplicated borders
    (reference rebuild_topology purpose)."""
    from redner_tpu.edge import build_edges
    from redner_tpu.scene import flatten_scene

    # Two triangles with duplicated shared-edge vertices.
    v = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
        np.float32,
    )
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    wv, wf, _ = rt.weld_mesh(v, f)
    cam = rt.make_camera(position=[0, 0, -3], look_at=[0, 0, 0], up=[0, 1, 0],
                         fov=45., resolution=(4, 4))
    mat = rt.make_material(diffuse_reflectance=[0.5, 0.5, 0.5])
    scene = rt.make_scene(cam, [rt.make_shape(vertices=wv, indices=wf)], [mat])
    fs = flatten_scene(scene)
    edges = build_edges(fs)
    # Welded: 5 unique edges, one of which is interior (f1 >= 0).
    valid = np.asarray(edges.valid)
    f1 = np.asarray(edges.f1)
    assert valid.sum() == 5
    assert ((f1 >= 0) & valid).sum() == 1

    # The UNWELDED mesh must classify identically: build_edges keys on
    # position-welded canonical ids (_weld_vertex_ids), so per-face
    # vertex splits no longer turn every edge into a boundary edge
    # (reference runs rebuild_topology at load for the same reason).
    scene_u = rt.make_scene(cam, [rt.make_shape(vertices=v, indices=f)],
                            [mat])
    edges_u = build_edges(flatten_scene(scene_u))
    valid_u = np.asarray(edges_u.valid)
    f1_u = np.asarray(edges_u.f1)
    assert valid_u.sum() == 5
    assert ((f1_u >= 0) & valid_u).sum() == 1

    # Coincident vertices across DIFFERENT shapes must NOT fuse.
    tri0 = rt.make_shape(vertices=v[:3], indices=[[0, 1, 2]])
    tri1 = rt.make_shape(vertices=v[3:], indices=[[0, 1, 2]])
    edges_2s = build_edges(flatten_scene(
        rt.make_scene(cam, [tri0, tri1], [mat])))
    valid_2s = np.asarray(edges_2s.valid)
    f1_2s = np.asarray(edges_2s.f1)
    assert valid_2s.sum() == 6
    assert ((f1_2s >= 0) & valid_2s).sum() == 0


def test_sh_basis_orthonormal_and_matches_l2():
    """General-order SH (reference pyredner/utils.py:10-62): the recurrence
    basis must be orthonormal over the sphere and reduce to the closed-form
    l<=2 table used by round-1 code."""
    import jax.numpy as jnp
    from redner_tpu.utils import sh_basis, sh_eval, _sh_basis_l2

    # Gauss-style lat-long quadrature on the sphere.
    nt, np_ = 64, 128
    theta = (np.arange(nt) + 0.5) / nt * np.pi
    phi = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
    T, P = np.meshgrid(theta, phi, indexing="ij")
    d = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    w = (np.sin(T) * (np.pi / nt) * (2 * np.pi / np_)).reshape(-1)

    B = np.asarray(sh_basis(3, jnp.asarray(d)), np.float64)  # (N, 16)
    gram = (B * w[:, None]).T @ B
    assert np.allclose(gram, np.eye(16), atol=2e-3), np.abs(
        gram - np.eye(16)
    ).max()

    # Reduces to the closed-form l<=2 table (same signs/convention).
    B2 = np.asarray(_sh_basis_l2(jnp.asarray(d)))
    assert np.allclose(B[:, :9], B2, atol=1e-5)

    # sh_eval infers the order: a pure l=3 coefficient reconstructs itself.
    c = np.zeros((16,), np.float32)
    c[12] = 1.0  # l=3, m=0
    vals = np.asarray(sh_eval(jnp.asarray(c), jnp.asarray(d)), np.float64)
    coeff = (vals * w * B[:, 12]).sum()
    assert abs(coeff - 1.0) < 2e-3


def test_geometry_image_reference_contract():
    """generate_geometry_image matches the reference's exact output
    contract (pyredner/geometry_images.py:7-164), verified bit-for-bit
    against the reference implementation executed side by side (r5) and
    pinned here by fingerprints: doubled grid (2*size+1)^2, octahedron
    layout (corners -> +z pole, center -> -z), spherical lat-long uvs of
    the pre-normalization point, per-quadrant diagonals, border wrap
    rule — including the reference's corner quirk (4 unpaired border
    edges; V-E+F = 1, not a watertight 2)."""
    import numpy as np

    from redner_tpu.geometry_images import generate_geometry_image

    fp = {2: (1052, 28.249998, [0, 5, 1], [19, 21, 0]),
          3: (4856, 54.250004, [0, 7, 1], [41, 43, 0]),
          8: (215036, 304.25, [0, 17, 1], [271, 273, 0])}
    for size, (isum, usum, first, last) in fp.items():
        v, i, u = generate_geometry_image(size)
        v, i, u = np.asarray(v), np.asarray(i), np.asarray(u)
        n = 2 * size + 1
        assert v.shape == (n * n, 3) and i.shape == (2 * (n - 1) ** 2, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0,
                                   atol=1e-6)
        assert (u >= 0).all() and (u <= 1).all()
        assert int(i.sum()) == isum
        np.testing.assert_allclose(float(u.sum()), usum, atol=1e-4)
        assert i[0].tolist() == first and i[-1].tolist() == last
    # topology: the wrap rule pairs all border edges except the
    # reference's 4 corner-seam edges
    v, i, u = generate_geometry_image(8)
    i = np.asarray(i)
    edges = {}
    for tri in i:
        for k in range(3):
            e = tuple(sorted((int(tri[k]), int(tri[(k + 1) % 3]))))
            edges[e] = edges.get(e, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts <= 2).all()
    assert int((counts == 1).sum()) == 4
