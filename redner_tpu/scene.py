"""Scene model and the render-ready flattened scene.

TPU-native re-design of the reference scene layer (pyredner/scene.py,
src/scene.cpp:63-307, src/scene.h:21-112).  Two levels:

  * `Scene` — the user-facing immutable pytree of Camera/Shape/Material/
    AreaLight/EnvironmentMap objects.  This *is* the differentiable input to
    `render`; there is no serialize/unpack pointer ABI like the reference's
    (pyredner/render_pytorch.py:68-647) because JAX pytrees subsume it.

  * `FlatScene` — structure-of-arrays buffers built (differentiably) from a
    Scene inside jit: concatenated vertices/faces, per-face-corner
    attributes, per-material packed textures, light-sampling CDF tables, and
    the packed envmap.  All shapes are static; gradients flow back through
    the gathers/concatenations to the original Scene leaves automatically.

Sampling tables (light PMF/CDF, triangle area CDFs, envmap CDFs, pdf_norm)
are stop-gradiented, matching the reference which returns no gradients for
them (SURVEY A.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from redner_tpu.camera import Camera
from redner_tpu.core import vecmath as vm
from redner_tpu.envmap import EnvironmentMap, PackedEnvmap, pack_envmap
from redner_tpu.geometry import Shape, tri_areas
from redner_tpu.light import AreaLight
from redner_tpu.material import LocalMaterial, Material
from redner_tpu.texture import PackedTexture, pack_texture, texture_eval


@struct.dataclass
class Scene:
    camera: Camera
    shapes: Tuple[Shape, ...]
    materials: Tuple[Material, ...]
    area_lights: Tuple[AreaLight, ...] = ()
    envmap: Optional[EnvironmentMap] = None

    @property
    def num_shapes(self):
        return len(self.shapes)

    @property
    def num_lights(self):
        n = len(self.area_lights)
        if self.envmap is not None:
            n += 1
        return n


def make_scene(camera, shapes, materials, area_lights=(), envmap=None) -> Scene:
    return Scene(
        camera=camera,
        shapes=tuple(shapes),
        materials=tuple(materials),
        area_lights=tuple(area_lights),
        envmap=envmap,
    )


_DEFAULT_UV = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]], np.float32)


@struct.dataclass
class FlatScene:
    """Render-ready SoA buffers (reference FlattenScene, src/scene.h:21-112)."""

    # Geometry
    vertices: jnp.ndarray  # (V, 3) all shapes concatenated
    faces: jnp.ndarray  # (F, 3) int32 global vertex ids
    face_shape_id: jnp.ndarray  # (F,) int32
    face_material_id: jnp.ndarray  # (F,) int32
    face_light_id: jnp.ndarray  # (F,) int32, -1 if not emissive
    # One differentiable row per face packing [v0|v1|v2 (9), n0|n1|n2 (9),
    # uv0|uv1|uv2 (6), c0|c1|c2 (9), has_normals (1)] = 34 floats.  TPU
    # gathers are latency-bound per ROW (~15 ns each at 512k lanes), so
    # the shading path fetches this one wide row per lane instead of ~8
    # separate narrow gathers; AD transposes it to a single scatter-add
    # per render plus one static unpack.
    face_pack: jnp.ndarray  # (F, 34)

    # Materials (per-material packed textures; tuples over materials)
    mat_diffuse: Tuple[PackedTexture, ...]
    mat_specular: Tuple[PackedTexture, ...]
    mat_roughness: Tuple[PackedTexture, ...]
    mat_normal_map: Tuple[Optional[PackedTexture], ...]
    mat_generic: Tuple[Optional[PackedTexture], ...]
    mat_two_sided: jnp.ndarray  # (M,) bool
    mat_use_vertex_color: jnp.ndarray  # (M,) bool
    mat_compute_specular: jnp.ndarray  # (M,) bool
    mat_has_normal_map: jnp.ndarray  # (M,) bool

    # Lights
    light_intensity: jnp.ndarray  # (L, 3)
    light_two_sided: jnp.ndarray  # (L,) bool
    light_directly_visible: jnp.ndarray  # (L,) bool
    light_pmf: jnp.ndarray  # (num_lights,) incl. envmap slot
    light_cdf: jnp.ndarray  # (num_lights,) exclusive scan of pmf
    light_areas: jnp.ndarray  # (L,)
    light_tri_cdf: jnp.ndarray  # (L, Tmax) exclusive area CDF, 2.0-padded
    light_tri_face: jnp.ndarray  # (L, Tmax) int32 global face id (clamped)

    # Environment
    envmap: Optional[PackedEnvmap]

    # Bounds
    bsphere_center: jnp.ndarray  # (3,)
    bsphere_radius: jnp.ndarray  # ()

    # Static metadata
    num_shapes: int = struct.field(pytree_node=False)
    num_materials: int = struct.field(pytree_node=False)
    num_area_lights: int = struct.field(pytree_node=False)
    has_envmap: bool = struct.field(pytree_node=False)
    shape_face_offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    shape_vertex_offsets: Tuple[int, ...] = struct.field(pytree_node=False)

    # Ray-casting acceleration tables, built ONCE per flatten
    # (accel.build_accel_cache) instead of inside every intersect call in
    # the bounce scan — the reference builds its BVH once per render too
    # (src/scene.cpp:86-155).  Dict of stop-gradiented arrays (a pytree
    # node); None before build, engines fall back to building inline.
    accel_cache: Optional[dict] = None

    @property
    def num_triangles(self):
        return self.faces.shape[0]

    @property
    def num_lights(self):
        return self.num_area_lights + (1 if self.has_envmap else 0)


def flatten_scene(scene: Scene, dtype=jnp.float32) -> FlatScene:
    """Differentiably flatten a Scene into FlatScene buffers.

    Equivalent in role to the reference Scene constructor + get_flatten_scene
    (src/scene.cpp:63-410), minus BVH build (accel structures live in
    redner_tpu.accel) and executed inside jit every render — cheap on TPU
    because it is pure gathers/concats, and it is what chains gradients from
    flat buffers back to user-level Shape/Material leaves.
    """
    shapes = scene.shapes
    materials = scene.materials
    assert len(shapes) > 0, "scene needs at least one shape"

    v_off = []
    f_off = []
    vo = fo = 0
    for s in shapes:
        v_off.append(vo)
        f_off.append(fo)
        vo += s.num_vertices
        fo += s.num_triangles

    verts = jnp.concatenate([s.vertices for s in shapes], axis=0).astype(dtype)
    faces = jnp.concatenate(
        [s.indices + off for s, off in zip(shapes, v_off)], axis=0
    )
    face_shape_id = jnp.concatenate(
        [jnp.full((s.num_triangles,), i, jnp.int32) for i, s in enumerate(shapes)]
    )
    face_material_id = jnp.concatenate(
        [
            jnp.full((s.num_triangles,), s.material_id, jnp.int32)
            for s in shapes
        ]
    )
    face_light_id = jnp.concatenate(
        [jnp.full((s.num_triangles,), s.light_id, jnp.int32) for s in shapes]
    )

    # Per-corner attributes
    uv_parts, n_parts, hn_parts, c_parts = [], [], [], []
    for s in shapes:
        F = s.num_triangles
        if s.uvs is not None:
            uvi = s.uv_indices if s.uv_indices is not None else s.indices
            uv_parts.append(s.uvs[uvi])  # (F, 3, 2)
        else:
            uv_parts.append(
                jnp.broadcast_to(jnp.asarray(_DEFAULT_UV, dtype), (F, 3, 2))
            )
        if s.normals is not None:
            ni = s.normal_indices if s.normal_indices is not None else s.indices
            n_parts.append(s.normals[ni])
            hn_parts.append(jnp.ones((F,), bool))
        else:
            n_parts.append(jnp.zeros((F, 3, 3), dtype))
            hn_parts.append(jnp.zeros((F,), bool))
        if s.colors is not None:
            c_parts.append(s.colors[s.indices])
        else:
            c_parts.append(jnp.zeros((F, 3, 3), dtype))
    face_uvs = jnp.concatenate(uv_parts, axis=0)
    face_normals = jnp.concatenate(n_parts, axis=0)
    face_has_normals = jnp.concatenate(hn_parts, axis=0)
    face_colors = jnp.concatenate(c_parts, axis=0)

    # Materials
    mat_diffuse = tuple(pack_texture(m.diffuse_reflectance) for m in materials)
    mat_specular = tuple(pack_texture(m.specular_reflectance) for m in materials)
    mat_roughness = tuple(pack_texture(m.roughness) for m in materials)
    mat_normal_map = tuple(
        pack_texture(m.normal_map) if m.normal_map is not None else None
        for m in materials
    )
    mat_generic = tuple(
        pack_texture(m.generic_texture) if m.generic_texture is not None else None
        for m in materials
    )
    mat_two_sided = jnp.asarray([m.two_sided for m in materials], bool)
    mat_use_vertex_color = jnp.asarray([m.use_vertex_color for m in materials], bool)
    mat_compute_specular = jnp.asarray(
        [m.compute_specular_lighting for m in materials], bool
    )
    mat_has_normal_map = jnp.asarray(
        [m.normal_map is not None for m in materials], bool
    )

    # Bounding sphere (axis-aligned box midpoint, src/scene.cpp:157-195)
    vmin = jnp.min(verts, axis=0)
    vmax = jnp.max(verts, axis=0)
    bcenter = 0.5 * (vmin + vmax)
    bradius = 0.5 * vm.length(vmax - vmin)

    # Lights + sampling tables (src/scene.cpp:197-253)
    L = len(scene.area_lights)
    sg = jax.lax.stop_gradient
    if L > 0:
        light_intensity = jnp.stack([l.intensity for l in scene.area_lights]).astype(dtype)
        light_two_sided = jnp.asarray([l.two_sided for l in scene.area_lights], bool)
        light_directly_visible = jnp.asarray(
            [l.directly_visible for l in scene.area_lights], bool
        )
        tmax = max(shapes[l.shape_id].num_triangles for l in scene.area_lights)
        tri_cdfs, tri_faces, areas, powers = [], [], [], []
        for l in scene.area_lights:
            s = shapes[l.shape_id]
            F = s.num_triangles
            a = tri_areas(s.vertices.astype(dtype), s.indices)
            total = jnp.sum(a)
            cdf = jnp.cumsum(a) - a  # exclusive scan (src/scene.cpp:47-51)
            cdf = cdf / jnp.maximum(total, 1e-20)
            pad = tmax - F
            cdf = jnp.concatenate([cdf, jnp.full((pad,), 2.0, dtype)])
            gface = jnp.arange(F, dtype=jnp.int32) + f_off[l.shape_id]
            gface = jnp.concatenate(
                [gface, jnp.full((pad,), f_off[l.shape_id] + F - 1, jnp.int32)]
            )
            tri_cdfs.append(cdf)
            tri_faces.append(gface)
            areas.append(total)
            powers.append(total * vm.luminance(l.intensity) * jnp.pi)
        light_tri_cdf = sg(jnp.stack(tri_cdfs))
        light_tri_face = jnp.stack(tri_faces)
        light_areas = sg(jnp.stack(areas))
        power = jnp.stack(powers)
    else:
        light_intensity = jnp.zeros((0, 3), dtype)
        light_two_sided = jnp.zeros((0,), bool)
        light_directly_visible = jnp.zeros((0,), bool)
        light_tri_cdf = jnp.zeros((0, 1), dtype)
        light_tri_face = jnp.zeros((0, 1), jnp.int32)
        light_areas = jnp.zeros((0,), dtype)
        power = jnp.zeros((0,), dtype)

    penv = pack_envmap(scene.envmap) if scene.envmap is not None else None
    if penv is not None:
        surface_area = 4.0 * jnp.pi * vm.square(bradius)
        env_power = jnp.where(
            surface_area > 0, surface_area / penv.pdf_norm, 1.0
        )
        power = jnp.concatenate([power, env_power[None]])
    total_power = jnp.maximum(jnp.sum(power), 1e-20)
    light_pmf = sg(power / total_power)
    light_cdf = sg(jnp.cumsum(light_pmf) - light_pmf)

    face_pack = jnp.concatenate(
        [
            verts[faces[:, 0]],
            verts[faces[:, 1]],
            verts[faces[:, 2]],
            face_normals.reshape(-1, 9),
            face_uvs.reshape(-1, 6),
            face_colors.reshape(-1, 9),
            face_has_normals.astype(dtype)[:, None],
        ],
        axis=-1,
    )

    fs = FlatScene(
        vertices=verts,
        faces=faces,
        face_pack=face_pack,
        face_shape_id=face_shape_id,
        face_material_id=face_material_id,
        face_light_id=face_light_id,
        mat_diffuse=mat_diffuse,
        mat_specular=mat_specular,
        mat_roughness=mat_roughness,
        mat_normal_map=mat_normal_map,
        mat_generic=mat_generic,
        mat_two_sided=mat_two_sided,
        mat_use_vertex_color=mat_use_vertex_color,
        mat_compute_specular=mat_compute_specular,
        mat_has_normal_map=mat_has_normal_map,
        light_intensity=light_intensity,
        light_two_sided=light_two_sided,
        light_directly_visible=light_directly_visible,
        light_pmf=light_pmf,
        light_cdf=light_cdf,
        light_areas=light_areas,
        light_tri_cdf=light_tri_cdf,
        light_tri_face=light_tri_face,
        envmap=penv,
        bsphere_center=bcenter,
        bsphere_radius=bradius,
        num_shapes=len(shapes),
        num_materials=len(materials),
        num_area_lights=L,
        has_envmap=scene.envmap is not None,
        shape_face_offsets=tuple(f_off),
        shape_vertex_offsets=tuple(v_off),
    )
    from redner_tpu import accel

    return fs.replace(accel_cache=accel.build_accel_cache(fs))


# ------------------------------------------------------------------
# Per-lane accessors
# ------------------------------------------------------------------


def gather_face_vertices(fs: FlatScene, tri_id):
    """Per-corner world positions for (clamped) triangle ids (..., 3)x3.

    One wide face_pack row gather (XLA CSEs it with
    gather_face_corner_attribs when both see the same tri_id) instead of
    a faces gather plus three dependent vertex gathers."""
    tid = jnp.clip(tri_id, 0, fs.num_triangles - 1)
    row = fs.face_pack[tid]
    return row[..., 0:3], row[..., 3:6], row[..., 6:9]


def gather_face_corner_attribs(fs: FlatScene, tri_id):
    """(uv0,uv1,uv2, n0,n1,n2, has_normals, c0,c1,c2) for triangle ids."""
    tid = jnp.clip(tri_id, 0, fs.num_triangles - 1)
    row = fs.face_pack[tid]
    return (
        row[..., 18:20], row[..., 20:22], row[..., 22:24],
        row[..., 9:12], row[..., 12:15], row[..., 15:18],
        row[..., 33] > 0.5,
        row[..., 24:27], row[..., 27:30], row[..., 30:33],
    )


def _fetch_material_stack(textures, uv, du_dxy, dv_dxy, mid, channels):
    """Evaluate a per-material texture bank and select by material id.

    One fused fetch per material with masked select — materials counts are
    small, so this stays vectorized (no per-lane dispatch, TPU-friendly).
    """
    out = jnp.zeros(uv.shape[:-1] + (channels,), uv.dtype)
    for m, ptex in enumerate(textures):
        if ptex is None:
            continue
        val = texture_eval(ptex, uv, du_dxy, dv_dxy)
        if val.shape[-1] < channels:
            val = jnp.concatenate(
                [val, jnp.zeros(val.shape[:-1] + (channels - val.shape[-1],), val.dtype)],
                axis=-1,
            )
        out = jnp.where((mid == m)[..., None], val, out)
    return out


def fetch_local_material(fs: FlatScene, sp, material_id) -> LocalMaterial:
    """Gather per-lane material values (textures + flags) for shading."""
    mid = jnp.clip(material_id, 0, fs.num_materials - 1)
    uv, du, dv = sp.uv, sp.du_dxy, sp.dv_dxy
    diffuse = _fetch_material_stack(fs.mat_diffuse, uv, du, dv, mid, 3)
    specular = _fetch_material_stack(fs.mat_specular, uv, du, dv, mid, 3)
    roughness = _fetch_material_stack(fs.mat_roughness, uv, du, dv, mid, 1)[..., 0]
    normal_value = _fetch_material_stack(fs.mat_normal_map, uv, du, dv, mid, 3)
    return LocalMaterial(
        diffuse=diffuse,
        specular=specular,
        roughness=roughness,
        normal_value=normal_value,
        two_sided=fs.mat_two_sided[mid],
        use_vertex_color=fs.mat_use_vertex_color[mid],
        compute_specular=fs.mat_compute_specular[mid],
        has_normal_map=fs.mat_has_normal_map[mid],
    )
