"""Wavefront OBJ/MTL loading and saving.

Feature-parity re-implementation of the reference loaders
(pyredner/load_obj.py, pyredner/save_obj.py, pyredner/save_mtl.py) on
numpy — parsing is host-side preprocessing, the resulting Shape/Material
pytrees are device arrays.

Semantics matched to the reference:
  * `load_obj(..., obj_group=True)` splits meshes per material (the
    reference groups faces by the active `usemtl`);
  * per-corner v/vt/vn index triples are kept as separate index arrays
    (uv_indices / normal_indices) unless the mesh is fully shared;
  * MTL: Kd -> diffuse, Ks -> specular, Ns (Phong exponent) -> roughness
    via roughness = 2 / (Ns + 2) (pyredner/load_obj.py Ns handling),
    Ke -> area-light intensity, map_Kd/map_Ks -> textures;
  * `flip_tex_coords=True` flips the v coordinate (OBJ images are
    bottom-up).
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from redner_tpu.geometry import Shape, compute_vertex_normal, make_shape
from redner_tpu.light import AreaLight, make_area_light
from redner_tpu.material import Material, make_material


class TriangleMesh(NamedTuple):
    vertices: np.ndarray
    indices: np.ndarray
    uvs: Optional[np.ndarray]
    normals: Optional[np.ndarray]
    uv_indices: Optional[np.ndarray]
    normal_indices: Optional[np.ndarray]
    # (V,) int32 eps-weld keying map for edge extraction, or None
    # (reference rebuilds topology at load, src/rebuild_topology.cpp:9-50).
    weld_ids: Optional[np.ndarray] = None


def _load_weld_ids(verts: np.ndarray, weld_eps) -> Optional[np.ndarray]:
    """Per-mesh load-time weld keying: near-duplicate split vertices
    (reduced-precision exports) must not turn every edge into a boundary
    edge in the silhouette tables.  'auto' keys eps to the mesh scale
    (1e-6 x bbox diagonal ~ the quantization of a %.6g export).  Returns
    None when nothing welds (the map would be identity) or the native
    helper is unavailable."""
    if weld_eps is None or verts.shape[0] < 2:
        return None
    eps = weld_eps
    if eps == "auto":
        diag = float(np.linalg.norm(verts.max(0) - verts.min(0)))
        eps = 1e-6 * diag
    if eps <= 0:
        return None
    try:
        from redner_tpu import meshops

        wids = meshops.weld_ids(verts, eps)
    except Exception:
        return None
    if np.array_equal(wids, np.arange(verts.shape[0], dtype=np.int32)):
        return None
    return wids


def _parse_mtl(path: str, dtype=np.float32):
    """Parse an MTL file -> {name: Material}, {name: Ke intensity}."""
    materials: Dict[str, Material] = {}
    emissions: Dict[str, np.ndarray] = {}
    if not os.path.exists(path):
        return materials, emissions
    cur = None
    props: Dict[str, object] = {}

    def flush():
        if cur is None:
            return
        Ns = float(props.get("Ns", 0.0))
        roughness = 2.0 / (Ns + 2.0) if Ns > 0 else 1.0
        diffuse = props.get("map_Kd", props.get("Kd", [0.5, 0.5, 0.5]))
        specular = props.get("map_Ks", props.get("Ks", None))
        materials[cur] = make_material(
            diffuse_reflectance=np.asarray(diffuse, dtype)
            if not isinstance(diffuse, np.ndarray) or diffuse.ndim <= 1
            else diffuse,
            specular_reflectance=None
            if specular is None
            else (np.asarray(specular, dtype)),
            roughness=np.asarray([roughness], dtype),
        )
        ke = np.asarray(props.get("Ke", [0.0, 0.0, 0.0]), dtype)
        if np.any(ke > 0):
            emissions[cur] = ke

    base = os.path.dirname(path)
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                flush()
                cur = parts[1] if len(parts) > 1 else ""
                props = {}
            elif key in ("Kd", "Ks", "Ke"):
                props[key] = [float(x) for x in parts[1:4]]
            elif key == "Ns":
                props["Ns"] = parts[1]
            elif key in ("map_Kd", "map_Ks"):
                from redner_tpu.io.image import imread

                tex_path = os.path.join(base, " ".join(parts[1:]))
                if os.path.exists(tex_path):
                    props[key] = np.asarray(imread(tex_path), dtype)
    flush()
    return materials, emissions


def _triangulate(poly: List[Tuple[int, int, int]]):
    """Fan-triangulate a polygon's corner triples."""
    tris = []
    for i in range(1, len(poly) - 1):
        tris.append((poly[0], poly[i], poly[i + 1]))
    return tris


def _parse_corner(token: str):
    """'v/vt/vn' -> (v, vt, vn) with -1 for missing (1-based -> 0-based)."""
    parts = token.split("/")
    v = int(parts[0])
    vt = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    vn = int(parts[2]) if len(parts) > 2 and parts[2] else 0
    return (v, vt, vn)


def load_obj(
    filename: str,
    obj_group: bool = True,
    flip_tex_coords: bool = True,
    use_common_indices: bool = False,
    return_objects: bool = False,
    weld_eps="auto",
    dtype=np.float32,
):
    """Load an OBJ file.

    Returns (material_map, mesh_list, light_map) like the reference
    (pyredner/load_obj.py), or a list of redner_tpu Objects when
    `return_objects=True`.

    material_map: {mtl_name: Material}
    mesh_list: [(mtl_name, TriangleMesh)]
    light_map: {mtl_name: intensity ndarray} for materials with Ke > 0

    weld_eps: eps-weld keying for edge extraction ("auto" = 1e-6 x bbox
    diagonal, a float for explicit, None to disable).  Geometry/UVs/
    normals are NOT modified — only Shape.weld_ids is attached (the
    reference rewrites topology at load instead,
    src/rebuild_topology.cpp:9-50).
    """
    positions: List[List[float]] = []
    uvs: List[List[float]] = []
    normals: List[List[float]] = []
    groups: Dict[str, List] = {}
    order: List[str] = []
    cur_mtl = ""
    materials: Dict[str, Material] = {}
    emissions: Dict[str, np.ndarray] = {}

    base = os.path.dirname(os.path.abspath(filename))
    with open(filename, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append([float(x) for x in parts[1:4]])
            elif key == "vt":
                u, v = float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0
                uvs.append([u, 1.0 - v if flip_tex_coords else v])
            elif key == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif key == "f":
                corners = [_parse_corner(t) for t in parts[1:]]
                tris = _triangulate(corners)
                gname = cur_mtl if obj_group else ""
                if gname not in groups:
                    groups[gname] = []
                    order.append(gname)
                groups[gname].extend(tris)
            elif key == "usemtl":
                cur_mtl = " ".join(parts[1:])
            elif key == "mtllib":
                mats, ems = _parse_mtl(os.path.join(base, " ".join(parts[1:])), dtype)
                materials.update(mats)
                emissions.update(ems)

    positions_np = np.asarray(positions, dtype)
    uvs_np = np.asarray(uvs, dtype) if uvs else None
    normals_np = np.asarray(normals, dtype) if normals else None
    nv = len(positions)
    nuv = len(uvs)
    nn = len(normals)

    def absidx(i, n):
        # OBJ: positive = 1-based; negative = relative to end; 0 = missing.
        if i > 0:
            return i - 1
        if i < 0:
            return n + i
        return -1

    mesh_list = []
    for gname in order:
        tris = groups[gname]
        vidx = np.asarray(
            [[absidx(c[0], nv) for c in tri] for tri in tris], np.int32
        )
        has_uv = uvs_np is not None and any(
            c[1] != 0 for tri in tris for c in tri
        )
        has_n = normals_np is not None and any(
            c[2] != 0 for tri in tris for c in tri
        )
        uvidx = (
            np.asarray([[absidx(c[1], nuv) for c in tri] for tri in tris], np.int32)
            if has_uv
            else None
        )
        nidx = (
            np.asarray([[absidx(c[2], nn) for c in tri] for tri in tris], np.int32)
            if has_n
            else None
        )
        if use_common_indices and (has_uv or has_n):
            # pyredner load_obj(use_common_indices=True) semantics: one
            # shared index buffer; vertices are split per distinct
            # (position, uv, normal) corner triple so uvs/normals are
            # per-vertex arrays (reference pyredner/load_obj.py).
            ui = np.where(uvidx < 0, 0, uvidx) if has_uv else np.zeros_like(vidx)
            ni = np.where(nidx < 0, 0, nidx) if has_n else np.zeros_like(vidx)
            triples = np.stack([vidx, ui, ni], axis=-1).reshape(-1, 3)
            uniq, inv = np.unique(triples, axis=0, return_inverse=True)
            verts = positions_np[uniq[:, 0]]
            vidx_local = inv.reshape(vidx.shape).astype(np.int32)
            g_uvs = uvs_np[uniq[:, 1]] if has_uv else None
            g_normals = normals_np[uniq[:, 2]] if has_n else None
            g_uvidx = g_nidx = None
        else:
            # Compact vertices used by this group.
            used, inv = np.unique(vidx.ravel(), return_inverse=True)
            verts = positions_np[used]
            vidx_local = inv.reshape(vidx.shape).astype(np.int32)
            g_uvs = g_uvidx = g_normals = g_nidx = None
            if has_uv:
                uvidx = np.where(uvidx < 0, 0, uvidx)
                u_used, u_inv = np.unique(uvidx.ravel(), return_inverse=True)
                g_uvs = uvs_np[u_used]
                g_uvidx = u_inv.reshape(uvidx.shape).astype(np.int32)
            if has_n:
                nidx = np.where(nidx < 0, 0, nidx)
                n_used, n_inv = np.unique(nidx.ravel(), return_inverse=True)
                g_normals = normals_np[n_used]
                g_nidx = n_inv.reshape(nidx.shape).astype(np.int32)
        mesh_list.append(
            (
                gname,
                TriangleMesh(
                    vertices=verts,
                    indices=vidx_local,
                    uvs=g_uvs,
                    normals=g_normals,
                    uv_indices=g_uvidx,
                    normal_indices=g_nidx,
                    weld_ids=_load_weld_ids(verts, weld_eps),
                ),
            )
        )
        if gname not in materials:
            materials[gname] = make_material(
                diffuse_reflectance=np.asarray([0.5, 0.5, 0.5], dtype)
            )

    material_map = {name: materials[name] for name, _ in mesh_list}
    light_map = {k: v for k, v in emissions.items()}
    if return_objects:
        from redner_tpu.object import Object

        objs = []
        for name, mesh in mesh_list:
            objs.append(
                Object(
                    vertices=mesh.vertices,
                    indices=mesh.indices,
                    material=material_map[name],
                    uvs=mesh.uvs,
                    normals=mesh.normals,
                    uv_indices=mesh.uv_indices,
                    normal_indices=mesh.normal_indices,
                    light_intensity=light_map.get(name),
                    weld_ids=mesh.weld_ids,
                )
            )
        return objs
    return material_map, mesh_list, light_map


def save_obj(shape, filename: str, flip_tex_coords: bool = True):
    """Write a Shape (or Object) to OBJ (reference pyredner/save_obj.py)."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    v = np.asarray(shape.vertices)
    f = np.asarray(shape.indices)
    uvs = None if shape.uvs is None else np.asarray(shape.uvs)
    normals = None if shape.normals is None else np.asarray(shape.normals)
    uvi = None if getattr(shape, "uv_indices", None) is None else np.asarray(shape.uv_indices)
    ni = None if getattr(shape, "normal_indices", None) is None else np.asarray(shape.normal_indices)
    with open(filename, "w") as out:
        out.write("# generated by redner_tpu\n")
        for p in v:
            out.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if uvs is not None:
            for t in uvs:
                tv = 1.0 - t[1] if flip_tex_coords else t[1]
                out.write(f"vt {t[0]} {tv}\n")
        if normals is not None:
            for nrm in normals:
                out.write(f"vn {nrm[0]} {nrm[1]} {nrm[2]}\n")
        for k, face in enumerate(f):
            toks = []
            for c in range(3):
                vi = face[c] + 1
                ti = (uvi[k][c] if uvi is not None else face[c]) + 1 if uvs is not None else None
                nn = (ni[k][c] if ni is not None else face[c]) + 1 if normals is not None else None
                if ti is not None and nn is not None:
                    toks.append(f"{vi}/{ti}/{nn}")
                elif ti is not None:
                    toks.append(f"{vi}/{ti}")
                elif nn is not None:
                    toks.append(f"{vi}//{nn}")
                else:
                    toks.append(f"{vi}")
            out.write("f " + " ".join(toks) + "\n")


def save_mtl(material, filename: str, name: str = "material_0"):
    """Write a Material to MTL (reference pyredner/save_mtl.py)."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as out:
        out.write(f"newmtl {name}\n")
        d = np.asarray(material.diffuse_reflectance.texels)
        if d.ndim == 1:
            out.write(f"Kd {d[0]} {d[1]} {d[2]}\n")
        s = np.asarray(material.specular_reflectance.texels)
        if s.ndim == 1 and np.any(s > 0):
            out.write(f"Ks {s[0]} {s[1]} {s[2]}\n")
        r = np.asarray(material.roughness.texels)
        if r.ndim == 1:
            ns = max(2.0 / max(float(r[0]), 1e-6) - 2.0, 0.0)
            out.write(f"Ns {ns}\n")
