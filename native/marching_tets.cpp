// Marching-tetrahedra iso-surface extraction.
//
// Native replacement for the PyMCubes dependency used by the reference's
// mesh export (nerf/utils.py:530-542 `extract_geometry` -> mcubes ->
// trimesh). Marching tetrahedra instead of marching cubes: the case logic
// is derivable from first principles (no 256-entry tables to get wrong)
// at the cost of ~2x triangle count, which is irrelevant for NeRF mesh
// export.
//
// Exposed via a C ABI for ctypes (focnerf_tpu/utils/mesh_extract.py); a
// vectorized numpy fallback implements the identical decomposition so the
// two can be cross-checked in tests.
//
// Build: make -C native  (produces libfocnerf_native.so)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Each cube [0,1]^3 is split into 6 tetrahedra around the main diagonal
// (0,0,0)-(1,1,1). Corner numbering: bit0 = x, bit1 = y, bit2 = z.
static const int kTets[6][4] = {
    {0, 5, 1, 3}, {0, 5, 3, 7}, {0, 5, 7, 4},
    {0, 7, 3, 2}, {0, 7, 2, 6}, {0, 7, 6, 4},
};

static const float kCorner[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

struct Vec3 {
  float x, y, z;
};

inline Vec3 lerp_edge(const float* p0, const float* p1, float v0, float v1, float iso) {
  float denom = v1 - v0;
  float t = (denom == 0.0f) ? 0.5f : (iso - v0) / denom;
  if (t < 0.0f) t = 0.0f;
  if (t > 1.0f) t = 1.0f;
  return {p0[0] + t * (p1[0] - p0[0]),
          p0[1] + t * (p1[1] - p0[1]),
          p0[2] + t * (p1[2] - p0[2])};
}

}  // namespace

extern "C" {

// grid: [nx * ny * nz] float, x-major (idx = x*ny*nz + y*nz + z).
// Emits triangle soup: verts_out gets 9 floats per triangle.
// Returns the number of triangles found (may exceed max_tris; only
// max_tris are written). Call once with max_tris=0 to size the buffer.
int64_t marching_tets(const float* grid, int nx, int ny, int nz, float iso,
                      float* verts_out, int64_t max_tris) {
  int64_t n_tris = 0;
  const int64_t syz = (int64_t)ny * nz;

  for (int x = 0; x < nx - 1; ++x) {
    for (int y = 0; y < ny - 1; ++y) {
      for (int z = 0; z < nz - 1; ++z) {
        float val[8];
        float pos[8][3];
        for (int c = 0; c < 8; ++c) {
          int cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
          val[c] = grid[(int64_t)cx * syz + (int64_t)cy * nz + cz];
          pos[c][0] = (float)cx;
          pos[c][1] = (float)cy;
          pos[c][2] = (float)cz;
        }
        // skip cubes fully inside/outside
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) (val[c] > iso ? any_in : any_out) = true;
        if (!any_in || !any_out) continue;

        for (int t = 0; t < 6; ++t) {
          const int* T = kTets[t];
          int mask = 0;
          for (int v = 0; v < 4; ++v)
            if (val[T[v]] > iso) mask |= 1 << v;
          if (mask == 0 || mask == 15) continue;

          // collect the in/out split
          int in_v[4], out_v[4], ni = 0, no = 0;
          for (int v = 0; v < 4; ++v) {
            if (mask & (1 << v)) in_v[ni++] = T[v];
            else out_v[no++] = T[v];
          }

          Vec3 tri[6];
          int emitted = 0;
          if (ni == 1) {  // one inside: single triangle
            tri[0] = lerp_edge(pos[in_v[0]], pos[out_v[0]], val[in_v[0]], val[out_v[0]], iso);
            tri[1] = lerp_edge(pos[in_v[0]], pos[out_v[1]], val[in_v[0]], val[out_v[1]], iso);
            tri[2] = lerp_edge(pos[in_v[0]], pos[out_v[2]], val[in_v[0]], val[out_v[2]], iso);
            emitted = 1;
          } else if (ni == 3) {  // one outside: single triangle
            tri[0] = lerp_edge(pos[in_v[0]], pos[out_v[0]], val[in_v[0]], val[out_v[0]], iso);
            tri[1] = lerp_edge(pos[in_v[1]], pos[out_v[0]], val[in_v[1]], val[out_v[0]], iso);
            tri[2] = lerp_edge(pos[in_v[2]], pos[out_v[0]], val[in_v[2]], val[out_v[0]], iso);
            emitted = 1;
          } else {  // two inside: quad -> two triangles
            Vec3 a = lerp_edge(pos[in_v[0]], pos[out_v[0]], val[in_v[0]], val[out_v[0]], iso);
            Vec3 b = lerp_edge(pos[in_v[0]], pos[out_v[1]], val[in_v[0]], val[out_v[1]], iso);
            Vec3 c = lerp_edge(pos[in_v[1]], pos[out_v[1]], val[in_v[1]], val[out_v[1]], iso);
            Vec3 d = lerp_edge(pos[in_v[1]], pos[out_v[0]], val[in_v[1]], val[out_v[0]], iso);
            tri[0] = a; tri[1] = b; tri[2] = c;
            tri[3] = a; tri[4] = c; tri[5] = d;
            emitted = 2;
          }

          for (int k = 0; k < emitted; ++k) {
            if (n_tris < max_tris && verts_out) {
              float* o = verts_out + n_tris * 9;
              for (int v = 0; v < 3; ++v) {
                o[v * 3 + 0] = tri[k * 3 + v].x;
                o[v * 3 + 1] = tri[k * 3 + v].y;
                o[v * 3 + 2] = tri[k * 3 + v].z;
              }
            }
            ++n_tris;
          }
        }
      }
    }
  }
  return n_tris;
}

}  // extern "C"
