"""Native C++ mesh ops: welding, UV atlas, fast OBJ scan
(reference rebuild_topology / automatic_uv_map / tests/test_compute_uvs.py)."""

import numpy as np
import pytest

from redner_tpu import meshops


def test_weld_duplicate_vertices():
    # Two triangles sharing an edge but with duplicated vertices.
    v = np.asarray(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0],
            [1, 0, 0], [1, 1, 0], [0, 1, 0],  # duplicates of 1 and 2
        ],
        np.float32,
    )
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    new_v, new_f, _ = meshops.weld_mesh(v, f, eps=1e-5)
    assert new_v.shape[0] == 4
    # The shared edge must now reference identical vertex ids.
    e1 = {tuple(sorted((new_f[0][i], new_f[0][(i + 1) % 3]))) for i in range(3)}
    e2 = {tuple(sorted((new_f[1][i], new_f[1][(i + 1) % 3]))) for i in range(3)}
    assert e1 & e2, "welded triangles must share an edge"


def test_weld_respects_uv_seams():
    v = np.asarray([[0, 0, 0], [0, 0, 0]], np.float32)
    uv = np.asarray([[0, 0], [0.5, 0.5]], np.float32)
    f = np.asarray([[0, 1, 0]], np.int32)
    new_v, _, new_u = meshops.weld_mesh(v, f, uvs=uv, eps=1e-5)
    assert new_v.shape[0] == 2  # different uvs -> not welded


def test_compute_uvs_cube():
    # A cube: charts should separate faces with different normals.
    from itertools import product

    corners = np.asarray(list(product([0, 1], repeat=3)), np.float32)
    faces = []
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # z faces
        (0, 4, 5, 1), (2, 3, 7, 6),  # y faces
        (0, 2, 6, 4), (1, 5, 7, 3),  # x faces
    ]
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    faces = np.asarray(faces, np.int32)
    uvs, uv_idx = meshops.compute_uvs(corners, faces)
    assert uvs.shape == (36, 2)
    assert uv_idx.shape == (12, 3)
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0 + 1e-5
    # Triangles must keep their area in UV space (no degenerate charts).
    tri_uv = uvs[uv_idx]
    e1 = tri_uv[:, 1] - tri_uv[:, 0]
    e2 = tri_uv[:, 2] - tri_uv[:, 0]
    area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert (area > 1e-6).all()


def test_uv_charts_do_not_overlap_much():
    from itertools import product

    corners = np.asarray(list(product([0, 1], repeat=3)), np.float32)
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    faces = np.asarray(faces, np.int32)
    uvs, uv_idx = meshops.compute_uvs(corners, faces)
    # Rasterize coverage: overlapping charts would double-cover texels.
    res = 128
    grid = np.zeros((res, res), np.int32)
    tri_uv = (uvs[uv_idx] * (res - 1)).astype(np.int64)
    for tri in tri_uv:
        lo = tri.min(0)
        hi = tri.max(0)
        # conservative box fill per triangle (upper bound on coverage)
        grid[lo[1]:hi[1] + 1, lo[0]:hi[0] + 1] += 1
    # Boxes of charts may touch, but most texels must be covered <= 2 times.
    assert (grid <= 2).mean() > 0.8


def test_fast_obj_roundtrip(tmp_path):
    path = str(tmp_path / "m.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n")
        f.write("f 1 2 3\nf 2/1 4/2 3/3\nf 1 2 3 4\n")  # quad triangulated
    v, faces = meshops.load_obj_fast(path)
    assert v.shape == (4, 3)
    assert faces.shape == (4, 3)  # 2 tris + quad -> 2 more
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
