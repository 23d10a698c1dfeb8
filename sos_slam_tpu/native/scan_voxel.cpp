// Native voxel keep-highest filter for the loop-closure scan accumulator.
//
// The reference assembles its "imitated LiDAR scan" by voxel-filtering the
// accumulated world points of recent keyframes, keeping the highest point
// per voxel (process_scan_forward, src/LoopClosure/ScanContext.cpp:106-178,
// via PCL VoxelGrid + height selection). This is the framework's native
// analog: transform to the current camera frame, range-gate, hash points
// into voxels, keep the minimum-y (highest) point per voxel.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC (see __init__.py)

#include <cstdint>
#include <cmath>
#include <unordered_map>

extern "C" {

// pts_w:   (n, 3) double world points (double end-to-end: the reference
//          accumulates Vector3d, and float here drifts voxel assignments
//          near bin edges, compounding across keyframes)
// valid:   (n,) uint8 mask (points of pruned keyframes are 0)
// T_cw:    (4, 4) row-major world->camera transform
// r:       lidar range
// inv_res: (3,) inverse voxel edge lengths
// keep_idx:(out, capacity n) indices into pts_w of the kept points
// pts_loc: (out, capacity n*3) camera-frame coordinates of kept points
// returns: number of kept points
int scan_voxel_filter(const double* pts_w, const uint8_t* valid, int n,
                      const double* T_cw, double r, const double* inv_res,
                      int32_t* keep_idx, double* pts_loc) {
  const double r00 = T_cw[0], r01 = T_cw[1], r02 = T_cw[2], t0 = T_cw[3];
  const double r10 = T_cw[4], r11 = T_cw[5], r12 = T_cw[6], t1 = T_cw[7];
  const double r20 = T_cw[8], r21 = T_cw[9], r22 = T_cw[10], t2 = T_cw[11];
  const int64_t sx = (int64_t)std::floor(2.0 * r * inv_res[0]) + 1;
  const int64_t sy = (int64_t)std::floor(2.0 * r * inv_res[1]) + 1;

  struct Slot { int32_t idx; double x, y, z; };
  std::unordered_map<int64_t, Slot> vox;
  vox.reserve((size_t)n);

  for (int i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    const double wx = pts_w[3 * i], wy = pts_w[3 * i + 1],
                 wz = pts_w[3 * i + 2];
    const double x = r00 * wx + r01 * wy + r02 * wz + t0;
    const double y = r10 * wx + r11 * wy + r12 * wz + t1;
    const double z = r20 * wx + r21 * wy + r22 * wz + t2;
    if (x * x + y * y + z * z >= r * r) continue;
    const int64_t ix = (int64_t)std::floor((x + r) * inv_res[0]);
    const int64_t iy = (int64_t)std::floor((y + r) * inv_res[1]);
    const int64_t iz = (int64_t)std::floor((z + r) * inv_res[2]);
    const int64_t loc = ix + sx * (iy + sy * iz);
    auto it = vox.find(loc);
    // keep the highest point: -y is up in the camera frame, so min y wins
    if (it == vox.end() || y < it->second.y) {
      vox[loc] = Slot{i, x, y, z};
    }
  }

  int m = 0;
  for (const auto& kv : vox) {
    keep_idx[m] = kv.second.idx;
    pts_loc[3 * m] = kv.second.x;
    pts_loc[3 * m + 1] = kv.second.y;
    pts_loc[3 * m + 2] = kv.second.z;
    ++m;
  }
  return m;
}

}  // extern "C"
