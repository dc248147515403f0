// Native mesh runtime for tds_tpu: Wavefront OBJ loading with mass-property
// computation, and marching-cubes SDF-to-mesh conversion.
//
// C ABI consumed via ctypes (tds_tpu/native/mesh.py). These are the
// TPU-framework analogs of the reference's vendored tinyobjloader and
// src/utils/sdf_to_mesh/ (plus mesh inertia, which the reference lacks:
// its Mesh geometry carries no inertia, geometry.hpp Mesh type id only).
//
// Build: tds_tpu/native/build.sh  (g++ -O2 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Mesh {
  std::vector<double> vertices;  // xyz triples
  std::vector<int32_t> indices;  // triangle index triples
};

// Split a polygon face into a triangle fan.
void push_face(std::vector<int32_t>& indices, const std::vector<int32_t>& face) {
  for (size_t i = 2; i < face.size(); ++i) {
    indices.push_back(face[0]);
    indices.push_back(face[i - 1]);
    indices.push_back(face[i]);
  }
}

int parse_obj(const char* text, Mesh* mesh) {
  const char* p = text;
  std::vector<int32_t> face;
  while (*p) {
    // find end of line
    const char* eol = strchr(p, '\n');
    size_t len = eol ? (size_t)(eol - p) : strlen(p);
    if (len >= 2 && p[0] == 'v' && p[1] == ' ') {
      double x, y, z;
      if (sscanf(p + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        mesh->vertices.push_back(x);
        mesh->vertices.push_back(y);
        mesh->vertices.push_back(z);
      }
    } else if (len >= 2 && p[0] == 'f' && p[1] == ' ') {
      face.clear();
      const char* q = p + 2;
      const char* end = p + len;
      while (q < end) {
        while (q < end && *q == ' ') ++q;
        if (q >= end) break;
        long idx = strtol(q, (char**)&q, 10);
        if (idx < 0) idx = (long)(mesh->vertices.size() / 3) + idx + 1;
        if (idx > 0) face.push_back((int32_t)(idx - 1));
        // skip texture/normal refs "/t/n"
        while (q < end && *q != ' ') ++q;
      }
      if (face.size() >= 3) push_face(mesh->indices, face);
    }
    if (!eol) break;
    p = eol + 1;
  }
  return mesh->vertices.empty() ? -1 : 0;
}

// Mass properties by signed tetrahedron decomposition about the origin
// (Mirtich-style). Assumes a closed, consistently-wound surface.
void mass_properties(const Mesh& m, double density, double* mass, double com[3],
                     double inertia[9]) {
  double vol = 0.0;
  double cx = 0, cy = 0, cz = 0;
  double ixx = 0, iyy = 0, izz = 0, ixy = 0, ixz = 0, iyz = 0;
  size_t nt = m.indices.size() / 3;
  for (size_t t = 0; t < nt; ++t) {
    const double* a = &m.vertices[3 * m.indices[3 * t + 0]];
    const double* b = &m.vertices[3 * m.indices[3 * t + 1]];
    const double* c = &m.vertices[3 * m.indices[3 * t + 2]];
    double det = a[0] * (b[1] * c[2] - b[2] * c[1]) -
                 a[1] * (b[0] * c[2] - b[2] * c[0]) +
                 a[2] * (b[0] * c[1] - b[1] * c[0]);
    double v = det / 6.0;
    vol += v;
    cx += v * (a[0] + b[0] + c[0]) / 4.0;
    cy += v * (a[1] + b[1] + c[1]) / 4.0;
    cz += v * (a[2] + b[2] + c[2]) / 4.0;
    // inertia integrals over the tetra (origin, a, b, c)
    auto sq = [](double x0, double x1, double x2) {
      return x0 * x0 + x1 * x1 + x2 * x2 + x0 * x1 + x0 * x2 + x1 * x2;
    };
    double xx = sq(a[0], b[0], c[0]);
    double yy = sq(a[1], b[1], c[1]);
    double zz = sq(a[2], b[2], c[2]);
    ixx += det * (yy + zz);
    iyy += det * (xx + zz);
    izz += det * (xx + yy);
    auto pr = [](const double* u, const double* v_, const double* w, int i, int j) {
      return 2.0 * (u[i] * u[j] + v_[i] * v_[j] + w[i] * w[j]) + u[i] * v_[j] +
             u[j] * v_[i] + u[i] * w[j] + u[j] * w[i] + v_[i] * w[j] + v_[j] * w[i];
    };
    ixy += det * pr(a, b, c, 0, 1);
    ixz += det * pr(a, b, c, 0, 2);
    iyz += det * pr(a, b, c, 1, 2);
  }
  *mass = density * vol;
  if (std::fabs(vol) > 1e-30) {
    com[0] = cx / vol;
    com[1] = cy / vol;
    com[2] = cz / vol;
  } else {
    com[0] = com[1] = com[2] = 0.0;
  }
  double k = density / 60.0;
  // inertia about the ORIGIN
  double Ixx = k * ixx, Iyy = k * iyy, Izz = k * izz;
  double Ixy = -density / 120.0 * ixy;
  double Ixz = -density / 120.0 * ixz;
  double Iyz = -density / 120.0 * iyz;
  // shift to COM (parallel axis, subtractive)
  double m_ = *mass;
  double x = com[0], y = com[1], z = com[2];
  Ixx -= m_ * (y * y + z * z);
  Iyy -= m_ * (x * x + z * z);
  Izz -= m_ * (x * x + y * y);
  Ixy += m_ * x * y;
  Ixz += m_ * x * z;
  Iyz += m_ * y * z;
  inertia[0] = Ixx; inertia[1] = Ixy; inertia[2] = Ixz;
  inertia[3] = Ixy; inertia[4] = Iyy; inertia[5] = Iyz;
  inertia[6] = Ixz; inertia[7] = Iyz; inertia[8] = Izz;
}

// ------------- marching tetrahedra (table-free isosurfacing) --------------
// Each grid cube splits into 6 tetrahedra; a tetrahedron crossing the
// isosurface emits 1 or 2 triangles depending on its 4-bit sign pattern.
// Functionally equivalent to the reference's marching-cubes sdf_to_mesh
// with a derivation-free case analysis.

inline void vertex_interp(double iso, const double p1[3], const double p2[3],
                          double v1, double v2, double out[3]) {
  double denom = v2 - v1;
  double mu = std::fabs(denom) < 1e-30 ? 0.5 : (iso - v1) / denom;
  if (mu < 0) mu = 0;
  if (mu > 1) mu = 1;
  out[0] = p1[0] + mu * (p2[0] - p1[0]);
  out[1] = p1[1] + mu * (p2[1] - p1[1]);
  out[2] = p1[2] + mu * (p2[2] - p1[2]);
}

// Emit triangles for one tetrahedron; returns triangles written (0..2).
inline int polygonize_tet(const double p[4][3], const double v[4], double iso,
                          double* out, int space) {
  int inside[4], nin = 0, nout = 0;
  int in_idx[4], out_idx[4];
  for (int i = 0; i < 4; ++i) {
    inside[i] = v[i] < iso;
    if (inside[i]) in_idx[nin++] = i;
    else out_idx[nout++] = i;
  }
  if (nin == 0 || nin == 4) return 0;
  double e[4][3];
  if (nin == 1 || nin == 3) {
    // one vertex isolated: single triangle on the three crossing edges
    int apex = (nin == 1) ? in_idx[0] : out_idx[0];
    int others[3], n = 0;
    for (int i = 0; i < 4; ++i)
      if (i != apex) others[n++] = i;
    if (space < 1) return 0;
    for (int i = 0; i < 3; ++i)
      vertex_interp(iso, p[apex], p[others[i]], v[apex], v[others[i]], e[i]);
    for (int i = 0; i < 3; ++i)
      for (int c = 0; c < 3; ++c) out[3 * i + c] = e[i][c];
    return 1;
  }
  // 2-2 split: quad on the four crossing edges -> two triangles
  if (space < 2) return 0;
  int a0 = in_idx[0], a1 = in_idx[1], b0 = out_idx[0], b1 = out_idx[1];
  vertex_interp(iso, p[a0], p[b0], v[a0], v[b0], e[0]);
  vertex_interp(iso, p[a0], p[b1], v[a0], v[b1], e[1]);
  vertex_interp(iso, p[a1], p[b1], v[a1], v[b1], e[2]);
  vertex_interp(iso, p[a1], p[b0], v[a1], v[b0], e[3]);
  const int tri[2][3] = {{0, 1, 2}, {0, 2, 3}};
  for (int t = 0; t < 2; ++t)
    for (int i = 0; i < 3; ++i)
      for (int c = 0; c < 3; ++c)
        out[9 * t + 3 * i + c] = e[tri[t][i]][c];
  return 2;
}

}  // namespace

extern "C" {

// Parse OBJ text. Returns handle id >= 0 or -1. Out params: counts.
static thread_local std::vector<Mesh*> g_meshes;

int tds_obj_parse(const char* text, int* num_vertices, int* num_triangles) {
  Mesh* m = new Mesh();
  if (parse_obj(text, m) != 0) {
    delete m;
    return -1;
  }
  *num_vertices = (int)(m->vertices.size() / 3);
  *num_triangles = (int)(m->indices.size() / 3);
  g_meshes.push_back(m);
  return (int)g_meshes.size() - 1;
}

void tds_obj_get(int handle, double* vertices, int32_t* indices) {
  Mesh* m = g_meshes[handle];
  memcpy(vertices, m->vertices.data(), m->vertices.size() * sizeof(double));
  memcpy(indices, m->indices.data(), m->indices.size() * sizeof(int32_t));
}

void tds_obj_free(int handle) {
  delete g_meshes[handle];
  g_meshes[handle] = nullptr;
}

// Mass properties of an indexed triangle mesh.
void tds_mesh_mass_properties(const double* vertices, int num_vertices,
                              const int32_t* indices, int num_triangles,
                              double density, double* mass, double* com,
                              double* inertia) {
  Mesh m;
  m.vertices.assign(vertices, vertices + 3 * num_vertices);
  m.indices.assign(indices, indices + 3 * num_triangles);
  mass_properties(m, density, mass, com, inertia);
}

// Isosurface of a dense SDF grid (nx*ny*nz values, x-fastest) via marching
// tetrahedra. Returns number of triangles; vertices written to out
// (9 doubles per triangle) up to max_triangles.
int tds_marching_cubes(const double* sdf, int nx, int ny, int nz,
                       double x0, double y0, double z0, double dx,
                       double iso, double* out, int max_triangles) {
  int count = 0;
  auto val = [&](int i, int j, int k) {
    return sdf[(size_t)k * nx * ny + (size_t)j * nx + i];
  };
  const int off[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                         {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
  // six tetrahedra covering the cube, all sharing the 0-6 diagonal
  const int tets[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                          {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};
  for (int k = 0; k + 1 < nz; ++k)
    for (int j = 0; j + 1 < ny; ++j)
      for (int i = 0; i + 1 < nx; ++i) {
        double p[8][3];
        double v[8];
        for (int c = 0; c < 8; ++c) {
          int ii = i + off[c][0], jj = j + off[c][1], kk = k + off[c][2];
          p[c][0] = x0 + ii * dx;
          p[c][1] = y0 + jj * dx;
          p[c][2] = z0 + kk * dx;
          v[c] = val(ii, jj, kk);
        }
        for (int t = 0; t < 6; ++t) {
          double tp[4][3], tv[4];
          for (int c = 0; c < 4; ++c) {
            memcpy(tp[c], p[tets[t][c]], sizeof(double) * 3);
            tv[c] = v[tets[t][c]];
          }
          int n = polygonize_tet(tp, tv, iso, out + 9 * count,
                                 max_triangles - count);
          count += n;
          if (count >= max_triangles) return count;
        }
      }
  return count;
}

}  // extern "C"
