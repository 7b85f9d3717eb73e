"""Load-time eps-weld keying (VERDICT r3 item 7).

An OBJ exported with per-face vertex splits at reduced precision has
near-duplicate vertices; without a weld, edge extraction keys on vertex
ids, classifies EVERY edge as boundary (always-silhouette), and floods
the edge estimators.  The reference rewrites topology at load
(src/rebuild_topology.cpp:9-50, pyredner/load_mitsuba.py:296); here the
loaders attach Shape.weld_ids — a keying-only map (geometry/UVs/normals
keep the split vertices) consumed by edge._weld_vertex_ids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import redner_tpu as rt
from redner_tpu.edge import build_edges
from redner_tpu.scene import flatten_scene

# The shadow ladder's blocker quad (tests/test_shadow.py), as a shared-
# vertex mesh and as a perturbed per-face-split export.
_QUAD_V = np.asarray(
    [[-0.6, 1.2, -0.5], [0.6, 1.2, -0.5], [-0.6, 1.2, 0.7], [0.6, 1.2, 0.7]],
    np.float32,
)
_QUAD_F = np.asarray([[0, 2, 1], [1, 2, 3]], np.int32)


def _split_perturbed(v, f, amp=2e-7, seed=0):
    """Give every face corner its own vertex, perturbed by ~amp (below
    the auto weld eps of 1e-6 x bbox diag, above bit-identity)."""
    rng = np.random.default_rng(seed)
    verts = v[f.reshape(-1)] + rng.uniform(
        -amp, amp, (f.size, 3)
    ).astype(np.float32)
    faces = np.arange(f.size, dtype=np.int32).reshape(f.shape)
    return verts, faces


def _write_obj(path, v, f):
    with open(path, "w") as out:
        for p in v:
            out.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for face in f:
            out.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def _boundary_count(shape):
    scene = rt.make_scene(
        rt.make_camera(position=[0.0, 3.0, -6.0], look_at=[0.0, 0.0, 0.0],
                       up=[0.0, 1.0, 0.0], fov=45.0, resolution=(4, 4)),
        [shape],
        [rt.make_material(diffuse_reflectance=[0.5] * 3)],
    )
    e = build_edges(flatten_scene(scene))
    return int(jnp.sum(e.valid & (e.f1 < 0)))


def test_weld_ids_restore_boundary_count(tmp_path):
    sv, sf = _split_perturbed(_QUAD_V, _QUAD_F)
    path = tmp_path / "split_quad.obj"
    _write_obj(path, sv, sf)

    objs = rt.load_obj(str(path), return_objects=True)
    assert len(objs) == 1
    assert objs[0].weld_ids is not None, "auto weld did not trigger"

    welded = rt.make_shape(vertices=objs[0].vertices,
                           indices=objs[0].indices,
                           weld_ids=objs[0].weld_ids)
    shared = rt.make_shape(vertices=_QUAD_V, indices=_QUAD_F)
    unwelded = rt.make_shape(vertices=objs[0].vertices,
                             indices=objs[0].indices)

    n_shared = _boundary_count(shared)      # quad: 4 rim edges
    n_welded = _boundary_count(welded)
    n_unwelded = _boundary_count(unwelded)  # split: all 6 edges boundary
    assert n_shared == 4
    assert n_welded == n_shared
    assert n_unwelded == 6


def test_weld_disabled_and_no_dup_meshes(tmp_path):
    """weld_eps=None disables; a mesh with no near-duplicates gets
    weld_ids=None (identity maps are dropped)."""
    sv, sf = _split_perturbed(_QUAD_V, _QUAD_F)
    path = tmp_path / "split_quad2.obj"
    _write_obj(path, sv, sf)
    objs = rt.load_obj(str(path), return_objects=True, weld_eps=None)
    assert objs[0].weld_ids is None

    path2 = tmp_path / "shared_quad.obj"
    _write_obj(path2, _QUAD_V, _QUAD_F)
    objs2 = rt.load_obj(str(path2), return_objects=True)
    assert objs2[0].weld_ids is None


def test_perturbed_split_blocker_shadow_gradient_matches_fd(tmp_path):
    """The end-to-end stake: a perturbed split-vertex blocker loaded from
    OBJ must produce the same FD-validated shadow gradient as the shared-
    vertex blocker (reference analog: rebuild_topology feeding the edge
    tables, src/redner.cpp / src/edge.cpp:233-296)."""
    sv, sf = _split_perturbed(_QUAD_V, _QUAD_F)
    path = tmp_path / "blocker.obj"
    _write_obj(path, sv, sf)
    obj = rt.load_obj(str(path), return_objects=True)[0]
    bverts = jnp.asarray(obj.vertices)
    bfaces = jnp.asarray(obj.indices)
    bweld = obj.weld_ids

    res = (24, 24)
    w = (
        0.25 + jnp.linspace(0.0, 1.0, res[1])[None, :, None]
        + 0.5 * jnp.linspace(0.0, 1.0, res[0])[:, None, None]
    )

    def scene_of(t, weld_ids):
        cam = rt.make_camera(position=[0.0, 3.0, -6.0],
                             look_at=[0.0, 0.0, 0.0], up=[0.0, 1.0, 0.0],
                             fov=45.0, resolution=res)
        floor = rt.make_shape(
            vertices=[[-4.0, 0.0, -4.0], [4.0, 0.0, -4.0],
                      [-4.0, 0.0, 4.0], [4.0, 0.0, 4.0]],
            indices=[[0, 2, 1], [1, 2, 3]], material_id=0)
        blocker = rt.make_shape(
            vertices=bverts + jnp.stack([t, jnp.asarray(0.0),
                                         jnp.asarray(0.0)]),
            indices=bfaces, material_id=0, weld_ids=weld_ids)
        light = rt.make_shape(
            vertices=[[-0.5, 3.0, -0.3], [0.5, 3.0, -0.3],
                      [-0.5, 3.0, 0.7], [0.5, 3.0, 0.7]],
            indices=[[0, 1, 2], [1, 3, 2]], material_id=0, light_id=0)
        return rt.make_scene(
            cam, [floor, blocker, light],
            [rt.make_material(diffuse_reflectance=[0.5] * 3)],
            area_lights=[rt.make_area_light(2, [30.0, 30.0, 30.0])])

    opts = rt.RenderOptions(num_samples=16, max_bounces=1)
    opts_fd = rt.RenderOptions(
        num_samples=32, max_bounces=1,
        use_primary_edge_sampling=False, use_secondary_edge_sampling=False)

    def loss(t, seed, options):
        return jnp.sum(w * rt.render(scene_of(t, bweld), options, seed=seed))

    grads = jax.jit(jax.vmap(
        lambda seed: jax.grad(loss)(jnp.asarray(0.0), seed, opts)
    ))(jnp.arange(24, dtype=jnp.uint32))
    g = float(jnp.mean(grads))

    eps = 0.1
    seeds = jnp.arange(16, dtype=jnp.uint32)
    fd_f = jax.jit(jax.vmap(lambda t, s: loss(t, s, opts_fd),
                            in_axes=(None, 0)))
    hi = np.asarray(fd_f(jnp.asarray(eps), seeds))
    lo = np.asarray(fd_f(jnp.asarray(-eps), seeds))
    fd = float(np.mean(hi - lo) / (2 * eps))

    assert abs(fd) > 0.5, f"FD degenerate: {fd}"
    assert abs(g - fd) <= 0.35 * abs(fd), (g, fd)
