// Golden-value harness: reference ScanContext — scan assembly
// (process_scan_forward, ScanContext.cpp:106-178), PCA alignment
// (getAlignTfmByPCA, :56-104), the 60x20 polar signature + ringkey
// (generate, :240-308) and the ringkey/signature searches
// (search_ringkey :310-342, search_sc :344-371) — vs
// sos_slam_tpu/loop/scancontext.py.
//
// flann/g2o resolve to the exact brute-force stubs in golden/stubs (the
// margin/threshold logic under test is the reference's own code; only the
// kd-tree internals are replaced by exact search). A deterministic
// integer-hash point cloud rides a square loop trajectory that revisits
// its start, so late frames produce ringkey candidates against early ones.
#include "util/settings.h"
#include "LoopClosure/ScanContext.h"
#include <cstdio>
#include <vector>

using namespace dso;

static const double RANGE = 40.0;

// deterministic camera-frame cloud for frame k: points on a rough ground
// plane + wall structure, integer-hash jitter (exactly reproducible in
// numpy double arithmetic)
static std::vector<Eigen::Vector3d> make_cloud(int k) {
  std::vector<Eigen::Vector3d> pts;
  for (int i = 0; i < 300; i++) {
    unsigned h = (unsigned)(i * 2654435761u) ^ (unsigned)(k * 40503u);
    double a = (double)(h % 997u) / 997.0;            // [0,1)
    double b = (double)((h / 997u) % 991u) / 991.0;
    double c = (double)((h / 7u) % 983u) / 983.0;
    // camera: +z forward, +x right, +y down. ground at y=+1.5, depth 2-30
    double z = 2.0 + 28.0 * a;
    double x = (b - 0.5) * 24.0;
    double y = (i % 3 == 0) ? (1.5 - 0.02 * z)            // ground
                            : (0.5 - 2.5 * c);            // structure
    // unique heights: the voxel keep-highest winner on an exact-y tie
    // depends on the reference's unordered_map iteration order (UB-ish);
    // keep the golden scene tie-free
    y += 1e-7 * (double)((i + 300 * k) % 9973);
    pts.emplace_back(x, y, z);
  }
  return pts;
}

// out-and-back corridor, 1 m steps, constant orientation: out 56 KFs,
// reverse 56, then a 20-KF revisit of the first stretch — the revisit
// frames (k >= 112) search against early frames, which are past the
// 100-frame insertion margin by then. Orientation never changes: the
// reference's orientation-prune path (ScanContext.cpp:120-127) erases
// from an unordered_map mid-iteration — UB that segfaults under this
// build — so the golden scene deliberately never triggers it (the prune
// is covered by sos_slam_tpu unit tests instead).
static const int NKF = 132;
static SE3 pose_at(int k) {
  double z;
  if (k < 56) z = (double)k;
  else if (k < 112) z = (double)(111 - k);
  else z = (double)(k - 112) + 0.5;
  // slight lateral drift so revisit scans differ subtly from originals
  double x = 0.02 * (double)(k >= 112 ? 1 : 0);
  return SE3(Eigen::Matrix3d::Identity(), Eigen::Vector3d(x, 0, z));
}

// getAlignTfmByPCA's `Vec3 center` is read before first write
// (ScanContext.cpp:58-61) — in the reference it silently absorbs whatever
// is on the stack. Zero a large stack region before every process_scan so
// that indeterminate value is deterministically 0.0 (what the Python zero-
// init mean assumes).
static void scrub_stack() {
  volatile char buf[1 << 20];
  for (size_t i = 0; i < sizeof(buf); i += 64) buf[i] = 0;
  for (size_t i = 0; i < sizeof(buf); i++) buf[i] = 0;
}

int main() {
  setting_cam_mode = FORWARD_CAM;
  setting_lidar_range = RANGE;
  setting_enable_imu = false;

  ScanContext sc;
  flann::Matrix<float> init_data(new float[sc.getHeight()], 1,
                                 sc.getHeight());
  for (unsigned i = 0; i < sc.getHeight(); i++) init_data[0][i] = 0.f;
  flann::Index<flann::L2<float>> *ringkeys =
      new flann::Index<flann::L2<float>>(init_data,
                                         flann::KDTreeIndexParams(4));
  ringkeys->buildIndex();

  std::vector<LoopFrame *> frames;
  for (int k = 0; k < NKF; k++) {
    SE3 wc = pose_at(k);
    const Eigen::Matrix<double, 4, 4> T = wc.matrix();
    printf("pose %d", k);
    for (int a = 0; a < 4; a++)
      for (int b = 0; b < 4; b++) printf(" %.17g", T(a, b));
    printf("\n");

    std::vector<Eigen::Vector3d> pts = make_cloud(k);
    g2o::SE3Quat tfm_sc_rig;
    scrub_stack();
    sc.process_scan(k, wc, pts, tfm_sc_rig);

    printf("scan %d %zu\n", k, pts.size());
    // scan points, camera frame (order = unordered_map iteration; the
    // Python side compares as sets)
    for (auto &p : pts)
      printf("sp %d %.9g %.9g %.9g\n", k, p(0), p(1), p(2));
    {
      Eigen::Vector3d tr = tfm_sc_rig.translation();
      Eigen::Quaterniond q = tfm_sc_rig.rotation();
      printf("tfm %d %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n", k, q.w(),
             q.x(), q.y(), q.z(), tr(0), tr(1), tr(2));
    }

    LoopFrame *lf = new LoopFrame();
    lf->kf_id = k;
    lf->tfm_sc_rig = tfm_sc_rig;
    lf->pts_sc = pts;
    flann::Matrix<float> ringkey;
    bool usable = sc.generate(lf, ringkey);
    printf("usable %d %d\n", k, usable ? 1 : 0);
    printf("ringkey %d", k);
    for (unsigned i = 0; i < sc.getHeight(); i++)
      printf(" %.9g", ringkey[0][i]);
    printf("\n");
    for (auto &e : lf->signature)
      printf("sig %d %d %.9g\n", k, e.first, e.second);

    std::vector<int> candidates;
    sc.search_ringkey(ringkey, ringkeys, candidates);
    printf("cand %d", k);
    for (int c : candidates) printf(" %d", c);
    printf("\n");
    frames.push_back(lf);
    if (!candidates.empty()) {
      int idx;
      float diff;
      sc.search_sc(lf->signature, frames, candidates, idx, diff);
      printf("match %d %d %.9g\n", k, idx, diff);
    }
  }
  return 0;
}
