// Host-side scan frontend: filter + transform + voxel binning in native code.
//
// The reference performs filterAndTransform + VoxelGridWeighted on the CPU
// (src/vofod_nodelet.cpp:619-686, src/voxel_grid_weighted.cpp:119-190); this
// is the TPU framework's equivalent for the PREBINNED ingest path: the host
// bins each scan into a packed dense uint8 count grid (low 6 bits = filtered
// point count clamped to 63 — the EMA weight 2^-count is f32-identical
// beyond that — bit 7 = any-return blocker flag) that rides the device
// upload, so the device-side frontend collapses to a pure elementwise unpack
// (pipeline/frontend.py run_frontend_prebinned).  This removes the
// histogram scatter — the single most expensive op in the device step, the
// one XLA cannot reshape (serialized ~8 ns/update, DESIGN.md §1) — from the
// device entirely.
//
// Float semantics mirror vofod_tpu/pipeline/frontend.py + ops/binning.py
// exactly (f32 arithmetic, same op order; build with -ffp-contract=off so the
// compiler cannot fuse a*b+c differently than XLA does).
//
// C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Binner {
  int64_t n_points;
  std::vector<float> dirs;   // [N, 3]
  std::vector<float> offs;   // [N, 3]
  std::vector<uint8_t> mask; // [N] FOV mask (1 = usable)
  float excl_lo[3], excl_hi[3];
  float op_lo[3], op_hi[3];
  float origin[3];
  int32_t nx, ny, nz;
  float inv_voxel;
};

static inline bool in_box(const float p[3], const float lo[3],
                          const float hi[3]) {
  return p[0] >= lo[0] && p[0] <= hi[0] && p[1] >= lo[1] && p[1] <= hi[1] &&
         p[2] >= lo[2] && p[2] <= hi[2];
}

}  // namespace

extern "C" {

void* vofod_binner_create(const float* dirs, const float* offs,
                          int64_t n_points, const uint8_t* mask,
                          const float* excl_lo, const float* excl_hi,
                          const float* op_lo, const float* op_hi,
                          const float* grid_origin, int32_t nx, int32_t ny,
                          int32_t nz, float voxel_size) {
  auto* b = new Binner();
  b->n_points = n_points;
  b->dirs.assign(dirs, dirs + 3 * n_points);
  b->offs.assign(offs, offs + 3 * n_points);
  if (mask) {
    b->mask.assign(mask, mask + n_points);
  } else {
    b->mask.assign(n_points, 1);
  }
  std::memcpy(b->excl_lo, excl_lo, sizeof b->excl_lo);
  std::memcpy(b->excl_hi, excl_hi, sizeof b->excl_hi);
  std::memcpy(b->op_lo, op_lo, sizeof b->op_lo);
  std::memcpy(b->op_hi, op_hi, sizeof b->op_hi);
  std::memcpy(b->origin, grid_origin, sizeof b->origin);
  b->nx = nx;
  b->ny = ny;
  b->nz = nz;
  b->inv_voxel = 1.0f / voxel_size;
  return b;
}

void vofod_binner_destroy(void* vb) { delete static_cast<Binner*>(vb); }

// Bin one scan into a packed dense uint8 grid.
//
// ranges_mm [N] (0 = no return); intensity [N] or NULL (treated as +inf);
// pose = 16 floats row-major world_T_sensor.
//
// Outputs:
//   out_grid [n_voxels] (z-major, x fastest): low 6 bits = filtered point
//     count clamped to 63 (the EMA weight 2^-count is f32-identical beyond
//     25, see pipeline/background.py clamp at ref :776-796), bit 7 =
//     any-return blocker flag (own-airframe hits included — they truncate
//     rays in the reference too, vofod_nodelet.cpp:1455).  Zeroed here.
//   out_active [N] or NULL: per-pixel raycast gate, the reference's skip
//     rule `intensity < min_int || (!mask && range == 0)` negated (:1449-1450).
//   out_stats [2] or NULL: {n_valid_points, n_exclude_hits} (true point
//     counts, unclamped).
void vofod_binner_bin_dense(void* vb, const uint32_t* ranges_mm,
                            const float* intensity, const float* pose,
                            float min_intensity, uint8_t* out_grid,
                            uint8_t* out_active, int32_t* out_stats) {
  auto* b = static_cast<Binner*>(vb);
  const float r00 = pose[0], r01 = pose[1], r02 = pose[2], tx = pose[3];
  const float r10 = pose[4], r11 = pose[5], r12 = pose[6], ty = pose[7];
  const float r20 = pose[8], r21 = pose[9], r22 = pose[10], tz = pose[11];
  const int64_t nv = int64_t(b->nx) * b->ny * b->nz;
  std::memset(out_grid, 0, size_t(nv));
  int32_t n_valid = 0, n_excl = 0;

  for (int64_t i = 0; i < b->n_points; ++i) {
    const float r = float(ranges_mm[i]) * 0.001f;
    const bool has_return = r > 0.0f;
    if (out_active) {
      const bool act =
          (!intensity || intensity[i] >= min_intensity) &&
          (b->mask[i] || has_return);
      out_active[i] = act ? 1 : 0;
    }
    if (!has_return) continue;
    // sensor-frame point: dir * r + off (f32, mul-then-add like XLA)
    const float* d = &b->dirs[3 * i];
    const float* o = &b->offs[3 * i];
    float ps[3] = {d[0] * r + o[0], d[1] * r + o[1], d[2] * r + o[2]};
    const bool excl = in_box(ps, b->excl_lo, b->excl_hi);
    // world transform (row-major R, p @ R.T + t elementwise order)
    float pw[3] = {ps[0] * r00 + ps[1] * r01 + ps[2] * r02 + tx,
                   ps[0] * r10 + ps[1] * r11 + ps[2] * r12 + ty,
                   ps[0] * r20 + ps[1] * r21 + ps[2] * r22 + tz};
    if (!in_box(pw, b->op_lo, b->op_hi)) continue;
    const int32_t ix = int32_t(std::floor((pw[0] - b->origin[0]) * b->inv_voxel));
    const int32_t iy = int32_t(std::floor((pw[1] - b->origin[1]) * b->inv_voxel));
    const int32_t iz = int32_t(std::floor((pw[2] - b->origin[2]) * b->inv_voxel));
    if (ix < 0 || ix >= b->nx || iy < 0 || iy >= b->ny || iz < 0 || iz >= b->nz)
      continue;
    const int32_t fid = (iz * b->ny + iy) * b->nx + ix;
    uint8_t v = out_grid[fid];
    v |= 0x80;  // any return blocks rays (incl. own airframe, :1455)
    if (excl) {
      ++n_excl;
    } else {
      ++n_valid;
      if ((v & 0x3f) < 63) ++v;  // saturating 6-bit count
    }
    out_grid[fid] = v;
  }

  if (out_stats) {
    out_stats[0] = n_valid;
    out_stats[1] = n_excl;
  }
}

}  // extern "C"
