// Native OBJ parser: the hot host-side ingestion path.
//
// C-ABI equivalent of the reference's vendored objl::Loader + LoadTriangleMesh
// (reference: external/obj_loader.h, src/shape.cc:23-68), exposed to Python
// via ctypes (jet_pbrt_tpu/utils/native.py). Semantics match the numpy
// fallback parser (jet_pbrt_tpu/scene/objio.py), which doubles as its test
// oracle: faces fan-triangulated, positions+texcoords only (normals are
// recomputed downstream from winding, like the reference).
//
// Build: make -C native

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Idx {
  long long v;
  long long t;
};

// Parse one face vertex token "v", "v/t", "v//n", "v/t/n". 1-based; negative
// indices are relative to the current end of the arrays.
bool parse_face_token(const char* tok, long long nv, long long nt, Idx* out) {
  char* end = nullptr;
  long long v = strtoll(tok, &end, 10);
  if (end == tok) return false;
  out->v = v > 0 ? v - 1 : nv + v;
  out->t = -1;
  if (*end == '/') {
    const char* p = end + 1;
    if (*p != '/' && *p != '\0') {
      long long t = strtoll(p, &end, 10);
      if (end != p) out->t = t > 0 ? t - 1 : nt + t;
    }
  }
  return out->v >= 0 && out->v < nv;
}

struct Mesh {
  std::vector<float> pos;       // xyz triples
  std::vector<float> tex;       // uv pairs
  std::vector<Idx> tri;         // 3 entries per triangle
};

bool load(const char* path, Mesh* m) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char line[8192];
  std::vector<Idx> face;
  while (fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      float x, y, z;
      if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
        m->pos.push_back(x);
        m->pos.push_back(y);
        m->pos.push_back(z);
      }
    } else if (line[0] == 'v' && line[1] == 't' && line[2] == ' ') {
      float u, v;
      if (sscanf(line + 3, "%f %f", &u, &v) == 2) {
        m->tex.push_back(u);
        m->tex.push_back(v);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      face.clear();
      const long long nv = (long long)m->pos.size() / 3;
      const long long nt = (long long)m->tex.size() / 2;
      char* save = nullptr;
      for (char* tok = strtok_r(line + 2, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save)) {
        Idx idx;
        if (parse_face_token(tok, nv, nt, &idx)) face.push_back(idx);
      }
      // fan triangulation, like objl (reference: external/obj_loader.h)
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        m->tri.push_back(face[0]);
        m->tri.push_back(face[k]);
        m->tri.push_back(face[k + 1]);
      }
    }
  }
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Returns the triangle count, or -1 on parse failure.
long long jp_obj_count(const char* path) {
  Mesh m;
  if (!load(path, &m)) return -1;
  return (long long)m.tri.size() / 3;
}

// Fills tris[n*3*3] and uvs[n*3*2]; returns the number of triangles written.
long long jp_obj_load(const char* path, float* tris, float* uvs,
                      long long n) {
  Mesh m;
  if (!load(path, &m)) return -1;
  const long long count = (long long)m.tri.size() / 3;
  if (count != n) return -1;
  const long long ntex = (long long)m.tex.size() / 2;
  for (long long i = 0; i < count * 3; ++i) {
    const Idx& idx = m.tri[i];
    memcpy(tris + i * 3, &m.pos[idx.v * 3], 3 * sizeof(float));
    if (idx.t >= 0 && idx.t < ntex) {
      memcpy(uvs + i * 2, &m.tex[idx.t * 2], 2 * sizeof(float));
    } else {
      uvs[i * 2] = 0.f;
      uvs[i * 2 + 1] = 0.f;
    }
  }
  return count;
}

}  // extern "C"
