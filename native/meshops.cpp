// Native mesh-processing runtime for redner_tpu.
//
// C++ equivalents of the reference's native preprocessing components:
//   * weld_vertices      — topology rebuild by position(+uv) welding
//                          (reference src/rebuild_topology.cpp role)
//   * atlas_uv           — automatic UV unwrap: normal-clustered charting,
//                          planar projection, shelf packing
//                          (reference src/automatic_uv_map.cpp + xatlas role)
//   * parse_obj_geometry — fast OBJ vertex/face scanner for large meshes
//
// These are host-side preprocessing (not the TPU compute path, which is
// JAX/XLA); they run once per asset. Exposed via a C ABI for ctypes.
//
// Build: g++ -O2 -shared -fPIC -o libmeshops.so meshops.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Vertex welding
// ---------------------------------------------------------------------

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // 3D spatial hash (large-prime mix)
        uint64_t h = (uint64_t)k.x * 73856093ull ^
                     (uint64_t)k.y * 19349663ull ^
                     (uint64_t)k.z * 83492791ull;
        return (size_t)h;
    }
};

// Weld vertices closer than eps (position only, or position+uv when
// uvs != nullptr). Writes the remapped index per input vertex into
// remap[num_vertices] and returns the welded vertex count. Representative
// positions are written into out_positions (3 * welded_count floats).
int64_t weld_vertices(const float* positions, int64_t num_vertices,
                      const float* uvs, float eps,
                      int32_t* remap, float* out_positions,
                      float* out_uvs) {
    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    const float inv = eps > 0 ? 1.0f / eps : 0.0f;
    const float eps2 = eps * eps;
    int64_t count = 0;
    for (int64_t i = 0; i < num_vertices; ++i) {
        const float* p = positions + 3 * i;
        int32_t found = -1;
        if (eps > 0) {
            int64_t cx = (int64_t)std::floor(p[0] * inv);
            int64_t cy = (int64_t)std::floor(p[1] * inv);
            int64_t cz = (int64_t)std::floor(p[2] * inv);
            for (int64_t dx = -1; dx <= 1 && found < 0; ++dx)
            for (int64_t dy = -1; dy <= 1 && found < 0; ++dy)
            for (int64_t dz = -1; dz <= 1 && found < 0; ++dz) {
                auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                if (it == grid.end()) continue;
                for (int32_t j : it->second) {
                    const float* q = out_positions + 3 * j;
                    float d0 = p[0] - q[0], d1 = p[1] - q[1], d2 = p[2] - q[2];
                    if (d0 * d0 + d1 * d1 + d2 * d2 > eps2) continue;
                    if (uvs) {
                        const float* u = uvs + 2 * i;
                        const float* v = out_uvs + 2 * j;
                        float du = u[0] - v[0], dv = u[1] - v[1];
                        if (du * du + dv * dv > eps2) continue;
                    }
                    found = j;
                    break;
                }
            }
            if (found < 0) {
                int32_t idx = (int32_t)count++;
                std::memcpy(out_positions + 3 * idx, p, 3 * sizeof(float));
                if (uvs) std::memcpy(out_uvs + 2 * idx, uvs + 2 * i,
                                     2 * sizeof(float));
                grid[CellKey{cx, cy, cz}].push_back(idx);
                found = idx;
            }
        } else {
            int32_t idx = (int32_t)count++;
            std::memcpy(out_positions + 3 * idx, p, 3 * sizeof(float));
            if (uvs) std::memcpy(out_uvs + 2 * idx, uvs + 2 * i,
                                 2 * sizeof(float));
            found = idx;
        }
        remap[i] = found;
    }
    return count;
}

// ---------------------------------------------------------------------
// Automatic UV atlas
// ---------------------------------------------------------------------

static void face_normal(const float* v0, const float* v1, const float* v2,
                        float* n) {
    float e1[3] = {v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2]};
    float e2[3] = {v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2]};
    n[0] = e1[1] * e2[2] - e1[2] * e2[1];
    n[1] = e1[2] * e2[0] - e1[0] * e2[2];
    n[2] = e1[0] * e2[1] - e1[1] * e2[0];
    float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len > 0) { n[0] /= len; n[1] /= len; n[2] /= len; }
}

// Chart the mesh by normal-cone region growing over face adjacency, project
// each chart onto its dominant plane, normalize and shelf-pack the charts.
// Outputs per-corner uvs (3 * num_faces * 2 floats) and per-corner uv
// indices equal to flat corner ids (3 * num_faces int32).
// Returns the number of charts.
int64_t atlas_uv(const float* positions, int64_t num_vertices,
                 const int32_t* indices, int64_t num_faces,
                 float normal_cos_threshold,
                 float* out_uvs, int32_t* out_uv_indices) {
    (void)num_vertices;
    // Face adjacency through shared (sorted) edges.
    std::unordered_map<uint64_t, std::vector<int32_t>> edge_faces;
    edge_faces.reserve(num_faces * 3);
    for (int64_t f = 0; f < num_faces; ++f) {
        for (int c = 0; c < 3; ++c) {
            int32_t a = indices[3 * f + c];
            int32_t b = indices[3 * f + (c + 1) % 3];
            uint64_t key = ((uint64_t)std::min(a, b) << 32) |
                           (uint32_t)std::max(a, b);
            edge_faces[key].push_back((int32_t)f);
        }
    }
    std::vector<float> normals(num_faces * 3);
    for (int64_t f = 0; f < num_faces; ++f) {
        face_normal(positions + 3 * indices[3 * f],
                    positions + 3 * indices[3 * f + 1],
                    positions + 3 * indices[3 * f + 2],
                    normals.data() + 3 * f);
    }

    std::vector<int32_t> chart(num_faces, -1);
    std::vector<int32_t> stack;
    int64_t num_charts = 0;
    std::vector<std::vector<int32_t>> chart_faces;
    for (int64_t seed = 0; seed < num_faces; ++seed) {
        if (chart[seed] >= 0) continue;
        int32_t cid = (int32_t)num_charts++;
        chart_faces.emplace_back();
        const float* seed_n = normals.data() + 3 * seed;
        stack.push_back((int32_t)seed);
        chart[seed] = cid;
        while (!stack.empty()) {
            int32_t f = stack.back();
            stack.pop_back();
            chart_faces[cid].push_back(f);
            for (int c = 0; c < 3; ++c) {
                int32_t a = indices[3 * f + c];
                int32_t b = indices[3 * f + (c + 1) % 3];
                uint64_t key = ((uint64_t)std::min(a, b) << 32) |
                               (uint32_t)std::max(a, b);
                for (int32_t g : edge_faces[key]) {
                    if (chart[g] >= 0) continue;
                    const float* gn = normals.data() + 3 * g;
                    float d = gn[0] * seed_n[0] + gn[1] * seed_n[1] +
                              gn[2] * seed_n[2];
                    if (d < normal_cos_threshold) continue;
                    chart[g] = cid;
                    stack.push_back(g);
                }
            }
        }
    }

    // Project each chart to the plane orthogonal to its seed normal.
    struct ChartBox { float w, h; int64_t id; };
    std::vector<ChartBox> boxes(num_charts);
    std::vector<float> chart_uv(num_faces * 6);
    for (int64_t cid = 0; cid < num_charts; ++cid) {
        const float* n = normals.data() + 3 * chart_faces[cid][0];
        // Build an orthonormal tangent basis (t, bt) for the plane.
        float t[3];
        if (std::fabs(n[0]) > 0.9f) { t[0] = 0; t[1] = 1; t[2] = 0; }
        else { t[0] = 1; t[1] = 0; t[2] = 0; }
        float dot = t[0] * n[0] + t[1] * n[1] + t[2] * n[2];
        t[0] -= dot * n[0]; t[1] -= dot * n[1]; t[2] -= dot * n[2];
        float tl = std::sqrt(t[0] * t[0] + t[1] * t[1] + t[2] * t[2]);
        t[0] /= tl; t[1] /= tl; t[2] /= tl;
        float bt[3] = {n[1] * t[2] - n[2] * t[1],
                       n[2] * t[0] - n[0] * t[2],
                       n[0] * t[1] - n[1] * t[0]};
        float minu = 1e30f, minv = 1e30f, maxu = -1e30f, maxv = -1e30f;
        for (int32_t f : chart_faces[cid]) {
            for (int c = 0; c < 3; ++c) {
                const float* p = positions + 3 * indices[3 * f + c];
                float u = p[0] * t[0] + p[1] * t[1] + p[2] * t[2];
                float v = p[0] * bt[0] + p[1] * bt[1] + p[2] * bt[2];
                chart_uv[6 * f + 2 * c] = u;
                chart_uv[6 * f + 2 * c + 1] = v;
                minu = std::min(minu, u); maxu = std::max(maxu, u);
                minv = std::min(minv, v); maxv = std::max(maxv, v);
            }
        }
        for (int32_t f : chart_faces[cid]) {
            for (int c = 0; c < 3; ++c) {
                chart_uv[6 * f + 2 * c] -= minu;
                chart_uv[6 * f + 2 * c + 1] -= minv;
            }
        }
        boxes[cid] = ChartBox{std::max(maxu - minu, 1e-8f),
                              std::max(maxv - minv, 1e-8f), cid};
    }

    // Rotate each chart flat (w >= h): shelf rows pack strictly better
    // when box heights are the smaller side (thinner rows, less per-row
    // slack above short boxes).
    std::vector<uint8_t> rotated(num_charts, 0);
    for (int64_t cid = 0; cid < num_charts; ++cid) {
        if (boxes[cid].h > boxes[cid].w) {
            rotated[cid] = 1;
            float bw = boxes[cid].w;
            for (int32_t f : chart_faces[cid]) {
                for (int c = 0; c < 3; ++c) {
                    float u = chart_uv[6 * f + 2 * c];
                    float v = chart_uv[6 * f + 2 * c + 1];
                    chart_uv[6 * f + 2 * c] = v;       // 90-degree turn
                    chart_uv[6 * f + 2 * c + 1] = bw - u;
                }
            }
            std::swap(boxes[cid].w, boxes[cid].h);
        }
    }

    // Shelf packing: sort by height, place left-to-right in rows; search
    // a few target widths and keep the squarest / densest result.
    std::sort(boxes.begin(), boxes.end(),
              [](const ChartBox& a, const ChartBox& b) { return a.h > b.h; });
    float total_area = 0;
    for (auto& b : boxes) total_area += b.w * b.h;
    float pad = std::sqrt(total_area) * 0.005f;
    std::vector<float> offx(num_charts), offy(num_charts);
    float best_side = 1e30f;
    static const float kWidthScale[] = {0.9f, 1.0f, 1.1f, 1.25f, 1.45f};
    for (float ws : kWidthScale) {
        float target_w = std::sqrt(total_area) * ws + 1e-8f;
        // widest box must fit the row
        for (auto& b : boxes) target_w = std::max(target_w, b.w);
        float x = 0, y = 0, row_h = 0, atlas_w = 0, atlas_h = 0;
        std::vector<float> ox(num_charts), oy(num_charts);
        for (auto& b : boxes) {
            if (x > 0 && x + b.w > target_w) {
                y += row_h + pad;
                x = 0;
                row_h = 0;
            }
            ox[b.id] = x;
            oy[b.id] = y;
            x += b.w + pad;
            row_h = std::max(row_h, b.h);
            atlas_w = std::max(atlas_w, x);
            atlas_h = std::max(atlas_h, y + b.h);
        }
        float side = std::max(atlas_w, atlas_h);
        if (side < best_side) {
            best_side = side;
            offx.swap(ox);
            offy.swap(oy);
        }
    }
    float norm = 1.0f / std::max(best_side, 1e-8f);

    for (int64_t f = 0; f < num_faces; ++f) {
        int32_t cid = chart[f];
        for (int c = 0; c < 3; ++c) {
            out_uvs[6 * f + 2 * c] =
                (chart_uv[6 * f + 2 * c] + offx[cid]) * norm;
            out_uvs[6 * f + 2 * c + 1] =
                (chart_uv[6 * f + 2 * c + 1] + offy[cid]) * norm;
            out_uv_indices[3 * f + c] = (int32_t)(3 * f + c);
        }
    }
    return num_charts;
}

// ---------------------------------------------------------------------
// Fast OBJ geometry scan (positions + triangulated faces only)
// ---------------------------------------------------------------------

// First pass: count vertices and triangles. Returns 0 on success.
int32_t obj_count(const char* path, int64_t* num_vertices,
                  int64_t* num_faces) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    char line[4096];
    int64_t nv = 0, nf = 0;
    while (std::fgets(line, sizeof(line), fp)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            // Count exactly what pass 2 will write: lines whose three
            // coordinates parse.
            float x, y, z;
            if (std::sscanf(line + 1, "%f %f %f", &x, &y, &z) == 3) ++nv;
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            int corners = 0;
            bool in_tok = false;
            for (char* c = line + 1; *c; ++c) {
                bool ws = *c == ' ' || *c == '\t' || *c == '\n' || *c == '\r';
                if (!ws && !in_tok) { ++corners; in_tok = true; }
                else if (ws) in_tok = false;
            }
            // Same 64-corner cap as pass 2's fixed buffer.
            if (corners > 64) corners = 64;
            if (corners >= 3) nf += corners - 2;
        }
    }
    std::fclose(fp);
    *num_vertices = nv;
    *num_faces = nf;
    return 0;
}

// Second pass: fill positions (3*nv) and triangulated indices (3*nf).
int32_t obj_read(const char* path, float* positions, int32_t* indices) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    char line[4096];
    int64_t vi = 0, fi = 0;
    while (std::fgets(line, sizeof(line), fp)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            float x, y, z;
            if (std::sscanf(line + 1, "%f %f %f", &x, &y, &z) == 3) {
                positions[3 * vi] = x;
                positions[3 * vi + 1] = y;
                positions[3 * vi + 2] = z;
                ++vi;
            }
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            int32_t corner_ids[64];
            int n = 0;
            char* c = line + 1;
            while (*c && n < 64) {
                while (*c == ' ' || *c == '\t') ++c;
                if (*c == '\n' || *c == '\r' || *c == '\0') break;
                long v = std::strtol(c, &c, 10);
                corner_ids[n++] = (int32_t)(v > 0 ? v - 1 : vi + v);
                while (*c && *c != ' ' && *c != '\t' && *c != '\n') ++c;
            }
            for (int k = 1; k + 1 < n; ++k) {
                indices[3 * fi] = corner_ids[0];
                indices[3 * fi + 1] = corner_ids[k];
                indices[3 * fi + 2] = corner_ids[k + 1];
                ++fi;
            }
        }
    }
    std::fclose(fp);
    return 0;
}

}  // extern "C"
