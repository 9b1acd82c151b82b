// Binned-SAH BVH builder (high-quality offline build path).
//
// Native counterpart of the driver-side acceleration-structure build
// the reference requests with PREFER_FAST_TRACE
// (ref: Graphics/RayTracing/Scene.cpp:172,253,256-311): a top-down
// 16-bin surface-area-heuristic builder.  Produces the same
// fixed-K-block leaf layout as the on-device LBVH (ops/lbvh.py) —
// leaves own K consecutive slots of a reordered triangle array, padded
// with -1 — so the Pallas packet kernel consumes either tree
// unchanged.  SAH trees cut node visits 20-40% vs LBVH on typical
// scenes; LBVH remains the on-device path for dynamic rebuilds.
//
// C ABI (ctypes): see sah_build().
#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

struct AABB {
    float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    void grow(const float* p) {
        for (int a = 0; a < 3; a++) {
            mn[a] = std::min(mn[a], p[a]);
            mx[a] = std::max(mx[a], p[a]);
        }
    }
    void grow(const AABB& o) {
        for (int a = 0; a < 3; a++) {
            mn[a] = std::min(mn[a], o.mn[a]);
            mx[a] = std::max(mx[a], o.mx[a]);
        }
    }
    float area() const {
        float dx = std::max(0.f, mx[0] - mn[0]);
        float dy = std::max(0.f, mx[1] - mn[1]);
        float dz = std::max(0.f, mx[2] - mn[2]);
        return 2.f * (dx * dy + dy * dz + dz * dx);
    }
};

struct Builder {
    const float *v0, *e1, *e2;
    int K;
    std::vector<AABB> tri_box;
    std::vector<float> centroid;  // (T, 3)
    std::vector<int> order;       // working permutation

    std::vector<int> child_l, child_r;
    std::vector<float> bl_min, bl_max, br_min, br_max;
    std::vector<int> leaf_tri;  // n_leaf * K, -1 padded
    std::vector<AABB> leaf_box;

    AABB range_box(int lo, int hi) {
        AABB b;
        for (int i = lo; i < hi; i++) b.grow(tri_box[order[i]]);
        return b;
    }

    int make_leaf(int lo, int hi) {
        int id = (int)leaf_box.size();
        AABB b;
        for (int i = lo; i < hi; i++) {
            leaf_tri.push_back(order[i]);
            b.grow(tri_box[order[i]]);
        }
        for (int i = hi - lo; i < K; i++) leaf_tri.push_back(-1);
        leaf_box.push_back(b);
        return -(id + 1);
    }

    // Returns child encoding (internal id >= 0, leaf < 0) + its box.
    int build(int lo, int hi, AABB& out_box) {
        int n = hi - lo;
        out_box = range_box(lo, hi);
        if (n <= K) return make_leaf(lo, hi);

        // Binned SAH over the centroid extent of the widest axis.
        AABB cb;
        for (int i = lo; i < hi; i++) cb.grow(&centroid[3 * order[i]]);
        int axis = 0;
        float ext = -1.f;
        for (int a = 0; a < 3; a++) {
            float e = cb.mx[a] - cb.mn[a];
            if (e > ext) {
                ext = e;
                axis = a;
            }
        }
        int mid;
        if (ext < 1e-12f) {
            mid = lo + n / 2;  // degenerate: median split
        } else {
            constexpr int NB = 16;
            AABB bins[NB];
            int count[NB] = {0};
            float inv = NB / ext;
            auto bin_of = [&](int tri) {
                int b = (int)((centroid[3 * tri + axis] - cb.mn[axis]) * inv);
                return std::min(std::max(b, 0), NB - 1);
            };
            for (int i = lo; i < hi; i++) {
                int b = bin_of(order[i]);
                bins[b].grow(tri_box[order[i]]);
                count[b]++;
            }
            float right_area[NB];
            AABB acc;
            int right_cnt[NB];
            int rc = 0;
            for (int b = NB - 1; b >= 1; b--) {
                acc.grow(bins[b]);
                rc += count[b];
                right_area[b] = acc.area();
                right_cnt[b] = rc;
            }
            AABB lacc;
            int lc = 0;
            float best = FLT_MAX;
            int best_split = -1;
            for (int b = 0; b < NB - 1; b++) {
                lacc.grow(bins[b]);
                lc += count[b];
                if (lc == 0 || right_cnt[b + 1] == 0) continue;
                float cost = lacc.area() * lc +
                             right_area[b + 1] * right_cnt[b + 1];
                if (cost < best) {
                    best = cost;
                    best_split = b;
                }
            }
            if (best_split < 0) {
                mid = lo + n / 2;
            } else {
                auto it = std::partition(
                    order.begin() + lo, order.begin() + hi,
                    [&](int tri) { return bin_of(tri) <= best_split; });
                mid = (int)(it - order.begin());
                if (mid == lo || mid == hi) mid = lo + n / 2;
            }
        }

        int id = (int)child_l.size();
        child_l.push_back(0);
        child_r.push_back(0);
        bl_min.resize(bl_min.size() + 3);
        bl_max.resize(bl_max.size() + 3);
        br_min.resize(br_min.size() + 3);
        br_max.resize(br_max.size() + 3);

        AABB lb, rb;
        int l = build(lo, mid, lb);
        int r = build(mid, hi, rb);
        child_l[id] = l;
        child_r[id] = r;
        std::memcpy(&bl_min[3 * id], lb.mn, 12);
        std::memcpy(&bl_max[3 * id], lb.mx, 12);
        std::memcpy(&br_min[3 * id], rb.mn, 12);
        std::memcpy(&br_max[3 * id], rb.mx, 12);
        return id;
    }
};

}  // namespace

extern "C" {

// Builds a SAH BVH over the `valid` triangles.
// In:  v0/e1/e2 (T,3) f32, valid (T,) i32, T, K (leaf capacity)
// Out (caller-allocated, capacities in brackets):
//   child_l/child_r [T]      i32 (leaves encoded -(leaf+1))
//   bl/br min/max   [T*3]    f32 (per-internal-node child boxes)
//   leaf_tri        [2*T]    i32 (n_leaf*K entries, -1 padding)
//   leaf_min/max    [T*3]    f32
// Returns n_internal; *n_leaf_out = number of leaves.
// Note: if every triangle is invalid, returns 0 with *n_leaf_out = 0.
int sah_build(const float* v0, const float* e1, const float* e2,
              const int* valid, int T, int K, int* child_l, int* child_r,
              float* bl_min, float* bl_max, float* br_min, float* br_max,
              int* leaf_tri, float* leaf_min, float* leaf_max,
              int* n_leaf_out) {
    Builder b;
    b.v0 = v0;
    b.e1 = e1;
    b.e2 = e2;
    b.K = K;
    b.tri_box.resize(T);
    b.centroid.resize(3 * T);
    for (int i = 0; i < T; i++) {
        float p0[3] = {v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
        float p1[3] = {p0[0] + e1[3 * i], p0[1] + e1[3 * i + 1],
                       p0[2] + e1[3 * i + 2]};
        float p2[3] = {p0[0] + e2[3 * i], p0[1] + e2[3 * i + 1],
                       p0[2] + e2[3 * i + 2]};
        b.tri_box[i].grow(p0);
        b.tri_box[i].grow(p1);
        b.tri_box[i].grow(p2);
        for (int a = 0; a < 3; a++)
            b.centroid[3 * i + a] =
                0.5f * (b.tri_box[i].mn[a] + b.tri_box[i].mx[a]);
        if (valid[i]) b.order.push_back(i);
    }
    if (b.order.empty()) {
        *n_leaf_out = 0;
        return 0;
    }
    AABB root;
    int root_enc = b.build(0, (int)b.order.size(), root);
    int ni = (int)b.child_l.size();
    if (ni == 0) {
        // Root is a single leaf: add an empty sibling so the tree has
        // the >= 1-internal-node shape the traversal expects.
        b.child_l.push_back(root_enc);
        AABB empty;
        b.child_r.push_back(b.make_leaf(0, 0));
        ni = 1;
        std::memcpy(bl_min, root.mn, 12);
        std::memcpy(bl_max, root.mx, 12);
        std::memcpy(br_min, empty.mn, 12);
        std::memcpy(br_max, empty.mx, 12);
    } else {
        std::memcpy(bl_min, b.bl_min.data(), ni * 12);
        std::memcpy(bl_max, b.bl_max.data(), ni * 12);
        std::memcpy(br_min, b.br_min.data(), ni * 12);
        std::memcpy(br_max, b.br_max.data(), ni * 12);
    }
    std::memcpy(child_l, b.child_l.data(), ni * 4);
    std::memcpy(child_r, b.child_r.data(), ni * 4);
    int nl = (int)b.leaf_box.size();
    std::memcpy(leaf_tri, b.leaf_tri.data(), nl * K * 4);
    for (int i = 0; i < nl; i++) {
        std::memcpy(&leaf_min[3 * i], b.leaf_box[i].mn, 12);
        std::memcpy(&leaf_max[3 * i], b.leaf_box[i].mx, 12);
    }
    *n_leaf_out = nl;
    return ni;
}

}  // extern "C"
