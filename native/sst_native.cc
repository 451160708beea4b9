// sst_native: in-tree native (C++) runtime components for sdfstudio-tpu.
//
// The reference framework gets all of its host-side native performance from
// external pip deps (skimage.measure.marching_cubes — Cython, reference
// nerfstudio/utils/marching_cubes.py:133; pymeshlab quadric decimation —
// C++, marching_cubes.py:162-167; TSDF fusion loops — torch CUDA,
// exporter/tsdf_utils.py:168-272). This file is their in-tree equivalent:
//
//   1. marching tetrahedra surface extraction with exact edge-keyed vertex
//      dedup (indexed, watertight output; same 6-tet 0-7-diagonal
//      decomposition as the numpy spec in sdfstudio_tpu/utils/marching_cubes.py)
//   2. quadric edge-collapse mesh simplification (Garland-Heckbert '97)
//   3. TSDF depth-map fusion into a voxel grid
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All functions return 0 on success. Buffers returned to Python are
// malloc'ed here and released with sst_free.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <functional>
#include <unordered_map>
#include <vector>
#include <queue>
#include <algorithm>
#include <limits>

extern "C" {

void sst_free(void *p) { free(p); }

// ---------------------------------------------------------------------------
// 1. Marching tetrahedra
// ---------------------------------------------------------------------------

// 6-tet decomposition of the cube around the 0-7 main diagonal; must match
// TETS in sdfstudio_tpu/utils/marching_cubes.py so native and numpy paths
// produce the same surface.
static const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 1, 5, 7}, {0, 2, 3, 7},
    {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 4, 6, 7},
};
// cube corner c sits at (c&1, (c>>1)&1, (c>>2)&1)
static const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
// case -> up to 2 triangles of tet-edge ids (-1 padded); bit i set = v_i < level
static const int TET_TRIS[16][2][3] = {
    {{-1, -1, -1}, {-1, -1, -1}},  // 0
    {{0, 1, 2}, {-1, -1, -1}},     // 1
    {{0, 4, 3}, {-1, -1, -1}},     // 2
    {{1, 4, 3}, {1, 2, 4}},        // 3
    {{1, 3, 5}, {-1, -1, -1}},     // 4
    {{0, 3, 5}, {0, 5, 2}},        // 5
    {{0, 4, 5}, {0, 5, 1}},        // 6
    {{2, 4, 5}, {-1, -1, -1}},     // 7
    {{2, 5, 4}, {-1, -1, -1}},     // 8
    {{0, 1, 5}, {0, 5, 4}},        // 9
    {{0, 5, 3}, {0, 2, 5}},        // 10
    {{1, 5, 3}, {-1, -1, -1}},     // 11
    {{1, 3, 4}, {1, 4, 2}},        // 12
    {{0, 3, 4}, {-1, -1, -1}},     // 13
    {{0, 2, 1}, {-1, -1, -1}},     // 14
    {{-1, -1, -1}, {-1, -1, -1}},  // 15
};

struct PairHash {
    size_t operator()(uint64_t k) const {
        // splitmix64
        k += 0x9e3779b97f4a7c15ULL;
        k = (k ^ (k >> 30)) * 0xbf58476d1ce4e5b9ULL;
        k = (k ^ (k >> 27)) * 0x94d049bb133111ebULL;
        return (size_t)(k ^ (k >> 31));
    }
};

// grid: [nx, ny, nz] C-order float32. Outputs malloc'ed verts [nv,3] f32 and
// faces [nf,3] int64.
int sst_marching_tets(const float *grid, int64_t nx, int64_t ny, int64_t nz,
                      float level, const float *origin, const float *spacing,
                      float **out_verts, int64_t *out_nv, int64_t **out_faces,
                      int64_t *out_nf) {
    *out_verts = nullptr;
    *out_faces = nullptr;
    *out_nv = 0;
    *out_nf = 0;
    if (nx < 2 || ny < 2 || nz < 2) return 0;

    std::vector<float> verts;
    std::vector<int64_t> faces;
    // edge key (packed global corner ids) -> vertex index
    std::unordered_map<uint64_t, int32_t, PairHash> edge_vert;
    edge_vert.reserve(1 << 16);

    const int64_t syz = ny * nz;
    auto gid = [&](int64_t x, int64_t y, int64_t z) { return x * syz + y * nz + z; };

    float cvals[8];
    int64_t cids[8];
    float cpos[8][3];

    for (int64_t x = 0; x + 1 < nx; ++x) {
        for (int64_t y = 0; y + 1 < ny; ++y) {
            const float *col0 = grid + x * syz + y * nz;
            const float *col1 = grid + x * syz + (y + 1) * nz;
            const float *col2 = grid + (x + 1) * syz + y * nz;
            const float *col3 = grid + (x + 1) * syz + (y + 1) * nz;
            for (int64_t z = 0; z + 1 < nz; ++z) {
                // corner order: bit0=x, bit1=y, bit2=z
                cvals[0] = col0[z];
                cvals[1] = col2[z];
                cvals[2] = col1[z];
                cvals[3] = col3[z];
                cvals[4] = col0[z + 1];
                cvals[5] = col2[z + 1];
                cvals[6] = col1[z + 1];
                cvals[7] = col3[z + 1];
                float vmin = cvals[0], vmax = cvals[0];
                for (int c = 1; c < 8; ++c) {
                    vmin = std::min(vmin, cvals[c]);
                    vmax = std::max(vmax, cvals[c]);
                }
                if (!(vmin < level && vmax >= level)) continue;

                for (int c = 0; c < 8; ++c) {
                    int64_t cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
                    cids[c] = gid(cx, cy, cz);
                    cpos[c][0] = (float)cx;
                    cpos[c][1] = (float)cy;
                    cpos[c][2] = (float)cz;
                }

                for (int t = 0; t < 6; ++t) {
                    const int *tet = TETS[t];
                    int tcase = 0;
                    for (int v = 0; v < 4; ++v)
                        if (cvals[tet[v]] < level) tcase |= 1 << v;
                    if (tcase == 0 || tcase == 15) continue;

                    // vertex index on each of the 6 tet edges (lazily created)
                    int32_t ev[6];
                    for (int e = 0; e < 6; ++e) ev[e] = -1;
                    for (int k = 0; k < 2; ++k) {
                        const int *tri = TET_TRIS[tcase][k];
                        if (tri[0] < 0) continue;
                        int32_t idx[3];
                        for (int j = 0; j < 3; ++j) {
                            int e = tri[j];
                            if (ev[e] < 0) {
                                int a = tet[TET_EDGES[e][0]], b = tet[TET_EDGES[e][1]];
                                int64_t ga = cids[a], gb = cids[b];
                                uint64_t key = ga < gb
                                                   ? ((uint64_t)ga << 32) | (uint64_t)gb
                                                   : ((uint64_t)gb << 32) | (uint64_t)ga;
                                auto it = edge_vert.find(key);
                                if (it != edge_vert.end()) {
                                    ev[e] = it->second;
                                } else {
                                    float va = cvals[a], vb = cvals[b];
                                    float denom = vb - va;
                                    float tt = std::fabs(denom) > 1e-12f
                                                   ? (level - va) / denom
                                                   : 0.5f;
                                    tt = std::min(1.0f, std::max(0.0f, tt));
                                    int32_t vi = (int32_t)(verts.size() / 3);
                                    for (int d = 0; d < 3; ++d) {
                                        float p = cpos[a][d] + tt * (cpos[b][d] - cpos[a][d]);
                                        verts.push_back(p * spacing[d] + origin[d]);
                                    }
                                    edge_vert.emplace(key, vi);
                                    ev[e] = vi;
                                }
                            }
                            idx[j] = ev[e];
                        }
                        // drop degenerate (two edge crossings merged) triangles
                        if (idx[0] == idx[1] || idx[1] == idx[2] || idx[0] == idx[2]) continue;
                        faces.push_back(idx[0]);
                        faces.push_back(idx[1]);
                        faces.push_back(idx[2]);
                    }
                }
            }
        }
    }

    *out_nv = (int64_t)(verts.size() / 3);
    *out_nf = (int64_t)(faces.size() / 3);
    if (*out_nv) {
        *out_verts = (float *)malloc(verts.size() * sizeof(float));
        memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
    }
    if (*out_nf) {
        *out_faces = (int64_t *)malloc(faces.size() * sizeof(int64_t));
        memcpy(*out_faces, faces.data(), faces.size() * sizeof(int64_t));
    }
    return 0;
}

// ---------------------------------------------------------------------------
// 2. Quadric edge-collapse simplification (Garland & Heckbert 1997)
// ---------------------------------------------------------------------------

struct Quadric {
    // symmetric 4x4: stored as 10 coeffs a..j for
    // [a b c d; b e f g; c f h i; d g i j]
    double q[10];
    Quadric() { memset(q, 0, sizeof(q)); }
    void add_plane(double a, double b, double c, double d) {
        q[0] += a * a; q[1] += a * b; q[2] += a * c; q[3] += a * d;
        q[4] += b * b; q[5] += b * c; q[6] += b * d;
        q[7] += c * c; q[8] += c * d;
        q[9] += d * d;
    }
    void add(const Quadric &o) {
        for (int i = 0; i < 10; ++i) q[i] += o.q[i];
    }
    double eval(const double v[3]) const {
        double x = v[0], y = v[1], z = v[2];
        return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z + 2 * q[3] * x +
               q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
               q[7] * z * z + 2 * q[8] * z + q[9];
    }
    // optimal position: solve [a b c; b e f; c f h] v = -[d; g; i]
    bool optimal(double v[3]) const {
        double A[3][3] = {{q[0], q[1], q[2]}, {q[1], q[4], q[5]}, {q[2], q[5], q[7]}};
        double rhs[3] = {-q[3], -q[6], -q[8]};
        // Cramer with determinant guard
        double det = A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1]) -
                     A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0]) +
                     A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]);
        if (std::fabs(det) < 1e-12) return false;
        double inv = 1.0 / det;
        v[0] = inv * (rhs[0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1]) -
                      A[0][1] * (rhs[1] * A[2][2] - A[1][2] * rhs[2]) +
                      A[0][2] * (rhs[1] * A[2][1] - A[1][1] * rhs[2]));
        v[1] = inv * (A[0][0] * (rhs[1] * A[2][2] - A[1][2] * rhs[2]) -
                      rhs[0] * (A[1][0] * A[2][2] - A[1][2] * A[2][0]) +
                      A[0][2] * (A[1][0] * rhs[2] - rhs[1] * A[2][0]));
        v[2] = inv * (A[0][0] * (A[1][1] * rhs[2] - rhs[1] * A[2][1]) -
                      A[0][1] * (A[1][0] * rhs[2] - rhs[1] * A[2][0]) +
                      rhs[0] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]));
        return true;
    }
};

struct HeapEdge {
    double cost;
    int32_t a, b;      // vertex ids (a < b)
    uint32_t stamp_a, stamp_b;  // version stamps for lazy invalidation
    double pos[3];
    bool operator<(const HeapEdge &o) const { return cost > o.cost; }  // min-heap
};

int sst_simplify_quadric(const float *verts_in, int64_t nv, const int64_t *faces_in,
                         int64_t nf, int64_t target_faces,
                         float **out_verts, int64_t *out_nv, int64_t **out_faces,
                         int64_t *out_nf) {
    *out_verts = nullptr; *out_faces = nullptr; *out_nv = 0; *out_nf = 0;
    if (nv == 0 || nf == 0) return 0;

    std::vector<double> V(nv * 3);
    for (int64_t i = 0; i < nv * 3; ++i) V[i] = verts_in[i];
    std::vector<int32_t> F(nf * 3);
    for (int64_t i = 0; i < nf * 3; ++i) F[i] = (int32_t)faces_in[i];

    std::vector<Quadric> Q(nv);
    std::vector<std::vector<int32_t>> vfaces(nv);  // faces incident to vertex
    std::vector<uint8_t> face_dead(nf, 0);
    std::vector<uint32_t> stamp(nv, 0);
    // union-find for collapsed vertices
    std::vector<int32_t> parent(nv);
    for (int64_t i = 0; i < nv; ++i) parent[i] = (int32_t)i;
    std::function<int32_t(int32_t)> find = [&](int32_t x) {
        while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
        return x;
    };

    // initial quadrics from face planes
    for (int64_t f = 0; f < nf; ++f) {
        int32_t i0 = F[f * 3], i1 = F[f * 3 + 1], i2 = F[f * 3 + 2];
        double *p0 = &V[i0 * 3], *p1 = &V[i1 * 3], *p2 = &V[i2 * 3];
        double e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        double e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        double n[3] = {e1[1] * e2[2] - e1[2] * e2[1], e1[2] * e2[0] - e1[0] * e2[2],
                       e1[0] * e2[1] - e1[1] * e2[0]};
        double len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (len < 1e-20) continue;
        for (int d = 0; d < 3; ++d) n[d] /= len;
        double dpl = -(n[0] * p0[0] + n[1] * p0[1] + n[2] * p0[2]);
        Q[i0].add_plane(n[0], n[1], n[2], dpl);
        Q[i1].add_plane(n[0], n[1], n[2], dpl);
        Q[i2].add_plane(n[0], n[1], n[2], dpl);
        vfaces[i0].push_back((int32_t)f);
        vfaces[i1].push_back((int32_t)f);
        vfaces[i2].push_back((int32_t)f);
    }

    std::priority_queue<HeapEdge> heap;
    auto push_edge = [&](int32_t a, int32_t b) {
        if (a == b) return;
        if (a > b) std::swap(a, b);
        Quadric q = Q[a];
        q.add(Q[b]);
        HeapEdge e;
        e.a = a; e.b = b; e.stamp_a = stamp[a]; e.stamp_b = stamp[b];
        if (!q.optimal(e.pos)) {
            // fall back to best of endpoints / midpoint
            double mid[3] = {(V[a * 3] + V[b * 3]) / 2, (V[a * 3 + 1] + V[b * 3 + 1]) / 2,
                             (V[a * 3 + 2] + V[b * 3 + 2]) / 2};
            const double *cands[3] = {&V[a * 3], &V[b * 3], mid};
            double best = std::numeric_limits<double>::max();
            for (const double *c : cands) {
                double cost = q.eval(c);
                if (cost < best) { best = cost; e.pos[0] = c[0]; e.pos[1] = c[1]; e.pos[2] = c[2]; }
            }
            e.cost = best;
        } else {
            e.cost = q.eval(e.pos);
        }
        heap.push(e);
    };

    // seed heap with all unique edges
    {
        std::unordered_map<uint64_t, char, PairHash> seen;
        seen.reserve(nf * 3);
        for (int64_t f = 0; f < nf; ++f) {
            for (int j = 0; j < 3; ++j) {
                int32_t a = F[f * 3 + j], b = F[f * 3 + (j + 1) % 3];
                if (a > b) std::swap(a, b);
                uint64_t key = ((uint64_t)a << 32) | (uint64_t)b;
                if (seen.emplace(key, 1).second) push_edge(a, b);
            }
        }
    }

    int64_t live_faces = nf;
    while (live_faces > target_faces && !heap.empty()) {
        HeapEdge e = heap.top();
        heap.pop();
        int32_t a = find(e.a), b = find(e.b);
        if (a == b) continue;
        if (e.stamp_a != stamp[e.a] || e.stamp_b != stamp[e.b]) continue;  // stale

        // collapse b into a at e.pos
        V[a * 3] = e.pos[0]; V[a * 3 + 1] = e.pos[1]; V[a * 3 + 2] = e.pos[2];
        Q[a].add(Q[b]);
        parent[b] = a;
        stamp[a]++; stamp[b]++;

        // merge face lists; kill faces that now have a repeated vertex
        auto &fa = vfaces[a];
        auto &fb = vfaces[b];
        fa.insert(fa.end(), fb.begin(), fb.end());
        fb.clear(); fb.shrink_to_fit();
        std::vector<int32_t> kept;
        kept.reserve(fa.size());
        std::unordered_map<uint64_t, char, PairHash> neigh;  // re-push edges once
        for (int32_t f : vfaces[a]) {
            if (face_dead[f]) continue;
            int32_t i0 = find(F[f * 3]), i1 = find(F[f * 3 + 1]), i2 = find(F[f * 3 + 2]);
            if (i0 == i1 || i1 == i2 || i0 == i2) {
                face_dead[f] = 1;
                --live_faces;
                continue;
            }
            kept.push_back(f);
            int32_t vs[3] = {i0, i1, i2};
            for (int j = 0; j < 3; ++j) {
                int32_t u = vs[j], w = vs[(j + 1) % 3];
                if (u != a && w != a) continue;
                int32_t x = u == a ? w : u;
                uint64_t key = ((uint64_t)std::min(a, x) << 32) | (uint64_t)std::max(a, x);
                if (neigh.emplace(key, 1).second) push_edge(a, x);
            }
        }
        // dedup kept face list
        std::sort(kept.begin(), kept.end());
        kept.erase(std::unique(kept.begin(), kept.end()), kept.end());
        vfaces[a] = std::move(kept);
    }

    // compact output
    std::vector<int32_t> remap(nv, -1);
    std::vector<float> vout;
    std::vector<int64_t> fout;
    for (int64_t f = 0; f < nf; ++f) {
        if (face_dead[f]) continue;
        int32_t ids[3];
        bool ok = true;
        for (int j = 0; j < 3; ++j) {
            int32_t v = find(F[f * 3 + j]);
            if (remap[v] < 0) {
                remap[v] = (int32_t)(vout.size() / 3);
                vout.push_back((float)V[v * 3]);
                vout.push_back((float)V[v * 3 + 1]);
                vout.push_back((float)V[v * 3 + 2]);
            }
            ids[j] = remap[v];
        }
        if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2]) ok = false;
        if (ok) { fout.push_back(ids[0]); fout.push_back(ids[1]); fout.push_back(ids[2]); }
    }
    *out_nv = (int64_t)(vout.size() / 3);
    *out_nf = (int64_t)(fout.size() / 3);
    if (*out_nv) {
        *out_verts = (float *)malloc(vout.size() * sizeof(float));
        memcpy(*out_verts, vout.data(), vout.size() * sizeof(float));
    }
    if (*out_nf) {
        *out_faces = (int64_t *)malloc(fout.size() * sizeof(int64_t));
        memcpy(*out_faces, fout.data(), fout.size() * sizeof(int64_t));
    }
    return 0;
}

// ---------------------------------------------------------------------------
// 3. TSDF fusion (one depth map per call)
// ---------------------------------------------------------------------------

// tsdf/weights: [nx,ny,nz] f32 (updated in place).
// K: 3x3 row-major intrinsics; w2c: 4x4 row-major world->camera.
// depth: [H,W] f32 (<=0 → invalid). origin: voxel (0,0,0) world position at
// voxel centers; voxel_size scalar. trunc: truncation distance.
int sst_tsdf_integrate(float *tsdf, float *weights, int64_t nx, int64_t ny, int64_t nz,
                       const float *origin, float voxel_size, const float *K,
                       const float *w2c, const float *depth, int64_t H, int64_t W,
                       float trunc) {
    const float fx = K[0], fy = K[4], cx = K[2], cy = K[5];
    for (int64_t x = 0; x < nx; ++x) {
        float wx = origin[0] + (float)x * voxel_size;
        for (int64_t y = 0; y < ny; ++y) {
            float wy = origin[1] + (float)y * voxel_size;
            float *trow = tsdf + (x * ny + y) * nz;
            float *wrow = weights + (x * ny + y) * nz;
            for (int64_t z = 0; z < nz; ++z) {
                float wz = origin[2] + (float)z * voxel_size;
                float cxp = w2c[0] * wx + w2c[1] * wy + w2c[2] * wz + w2c[3];
                float cyp = w2c[4] * wx + w2c[5] * wy + w2c[6] * wz + w2c[7];
                float czp = w2c[8] * wx + w2c[9] * wy + w2c[10] * wz + w2c[11];
                if (czp <= 1e-6f) continue;
                float u = fx * cxp / czp + cx;
                float v = fy * cyp / czp + cy;
                int64_t ui = (int64_t)std::lround(u), vi = (int64_t)std::lround(v);
                if (ui < 0 || ui >= W || vi < 0 || vi >= H) continue;
                float d = depth[vi * W + ui];
                if (d <= 0.0f) continue;
                float sdf = d - czp;
                if (sdf < -trunc) continue;
                float tval = std::min(1.0f, sdf / trunc);
                float wold = wrow[z];
                float wnew = wold + 1.0f;
                trow[z] = (trow[z] * wold + tval) / wnew;
                wrow[z] = wnew;
            }
        }
    }
    return 0;
}

}  // extern "C"
