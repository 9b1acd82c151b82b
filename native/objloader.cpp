// Fast OBJ loader + exact-match vertex dedup.
//
// Native counterpart of the reference's asset path: tinyobjloader parse
// + unordered_map dedup (ref: Graphics/RayTracing/Scene.cpp:29-74,
// libs/tinyobj/tiny_obj_loader.h).  Same semantics as the Python
// fallback in hrt_tpu/models/mesh.py: Y negated on positions and
// normals, vertices keyed on the full 8-float record, polygon fan
// triangulation, 1-based/negative OBJ indices.
//
// C ABI (ctypes):
//   obj_load(path, &out) -> 0 ok / nonzero error
//   struct ObjMesh { float* vertices; int n_vertices;
//                    int* indices; int n_tris; }
//   obj_free(&out)
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vert {
    float v[8];
    bool operator==(const Vert& o) const {
        return std::memcmp(v, o.v, sizeof(v)) == 0;
    }
};

struct VertHash {
    size_t operator()(const Vert& x) const {
        // FNV-1a over the raw bytes.
        const unsigned char* p = reinterpret_cast<const unsigned char*>(x.v);
        size_t h = 1469598103934665603ull;
        for (size_t i = 0; i < sizeof(x.v); i++) {
            h ^= p[i];
            h *= 1099511628211ull;
        }
        return h;
    }
};

int resolve(int idx, int n) {
    if (idx > 0) return idx - 1;
    if (idx < 0) return n + idx;
    return -1;
}

}  // namespace

extern "C" {

struct ObjMesh {
    float* vertices;  // (n_vertices, 8)
    int n_vertices;
    int* indices;  // (n_tris, 3)
    int n_tris;
};

int obj_load(const char* path, ObjMesh* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string text(size, '\0');
    if (std::fread(text.data(), 1, size, f) != static_cast<size_t>(size)) {
        std::fclose(f);
        return 2;
    }
    std::fclose(f);

    std::vector<float> pos, nrm, uv;
    std::vector<Vert> verts;
    std::vector<int> indices;
    std::unordered_map<Vert, int, VertHash> unique;
    std::vector<std::array<int, 3>> corners;

    const char* p = text.c_str();
    const char* end = p + text.size();
    char tag[8];
    while (p < end) {
        // skip leading whitespace
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                           *p == '\n'))
            p++;
        if (p >= end) break;
        const char* line_end = p;
        while (line_end < end && *line_end != '\n') line_end++;
        if (*p == '#') {
            p = line_end;
            continue;
        }
        int ti = 0;
        while (p < line_end && *p != ' ' && *p != '\t' && ti < 7)
            tag[ti++] = *p++;
        tag[ti] = 0;
        if (std::strcmp(tag, "v") == 0) {
            char* q = const_cast<char*>(p);
            float x = std::strtof(q, &q);
            float y = std::strtof(q, &q);
            float z = std::strtof(q, &q);
            pos.push_back(x);
            pos.push_back(-y);  // Y-flip (Scene.cpp:49)
            pos.push_back(z);
        } else if (std::strcmp(tag, "vn") == 0) {
            char* q = const_cast<char*>(p);
            float x = std::strtof(q, &q);
            float y = std::strtof(q, &q);
            float z = std::strtof(q, &q);
            nrm.push_back(x);
            nrm.push_back(-y);  // Y-flip (Scene.cpp:55)
            nrm.push_back(z);
        } else if (std::strcmp(tag, "vt") == 0) {
            char* q = const_cast<char*>(p);
            uv.push_back(std::strtof(q, &q));
            uv.push_back(std::strtof(q, &q));
        } else if (std::strcmp(tag, "f") == 0) {
            corners.clear();
            const char* q = p;
            while (q < line_end) {
                while (q < line_end && (*q == ' ' || *q == '\t')) q++;
                if (q >= line_end) break;
                int vi = 0, tix = 0, ni = 0;
                char* qq = const_cast<char*>(q);
                vi = static_cast<int>(std::strtol(qq, &qq, 10));
                if (*qq == '/') {
                    qq++;
                    if (*qq != '/')
                        tix = static_cast<int>(std::strtol(qq, &qq, 10));
                    if (*qq == '/') {
                        qq++;
                        ni = static_cast<int>(std::strtol(qq, &qq, 10));
                    }
                }
                q = qq;
                corners.push_back({resolve(vi, (int)pos.size() / 3),
                                   resolve(tix, (int)uv.size() / 2),
                                   resolve(ni, (int)nrm.size() / 3)});
            }
            for (size_t k = 1; k + 1 < corners.size(); k++) {
                const std::array<int, 3> tri_c[3] = {
                    corners[0], corners[k], corners[k + 1]};
                for (const auto& c : tri_c) {
                    Vert v{};
                    if (c[0] >= 0) {
                        v.v[0] = pos[3 * c[0]];
                        v.v[1] = pos[3 * c[0] + 1];
                        v.v[2] = pos[3 * c[0] + 2];
                    }
                    if (c[2] >= 0) {
                        v.v[3] = nrm[3 * c[2]];
                        v.v[4] = nrm[3 * c[2] + 1];
                        v.v[5] = nrm[3 * c[2] + 2];
                    }
                    if (c[1] >= 0) {
                        v.v[6] = uv[2 * c[1]];
                        v.v[7] = uv[2 * c[1] + 1];
                    }
                    auto it = unique.find(v);
                    int id;
                    if (it == unique.end()) {
                        id = (int)verts.size();
                        unique.emplace(v, id);
                        verts.push_back(v);
                    } else {
                        id = it->second;
                    }
                    indices.push_back(id);
                }
            }
        }
        p = line_end;
    }

    out->n_vertices = (int)verts.size();
    out->n_tris = (int)indices.size() / 3;
    out->vertices = (float*)std::malloc(sizeof(float) * 8 * verts.size());
    out->indices = (int*)std::malloc(sizeof(int) * indices.size());
    std::memcpy(out->vertices, verts.data(), sizeof(float) * 8 * verts.size());
    std::memcpy(out->indices, indices.data(), sizeof(int) * indices.size());
    return 0;
}

void obj_free(ObjMesh* m) {
    std::free(m->vertices);
    std::free(m->indices);
    m->vertices = nullptr;
    m->indices = nullptr;
}

}  // extern "C"
