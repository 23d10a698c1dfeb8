// Golden-value harness: vendored Sophus SE3/SO3/Sim3 (thirdparty/Sophus)
// vs sos_slam_tpu/utils/lie.py. Prints, for a deterministic set of tangent
// vectors: SE3 exp matrix + log roundtrip + adjoint, SO3 exp/log, Sim3
// exp matrix + log roundtrip. Plain-text floats, one record per line.
#include <sophus/se3.hpp>
#include <sophus/sim3.hpp>
#include <sophus/so3.hpp>
#include <cstdio>
#include <cstdint>

static uint64_t lcg_state = 0x243F6A8885A308D3ull;
static double lcg() {  // deterministic in [-1, 1)
  lcg_state = lcg_state * 6364136223846793005ull + 1442695040888963407ull;
  return (double)(int64_t)(lcg_state >> 11) / (double)(1ll << 52) - 1.0;
}

int main() {
  const int N = 32;
  for (int k = 0; k < N; k++) {
    Eigen::Matrix<double, 6, 1> xi;   // Sophus order: [upsilon, omega]
    for (int i = 0; i < 6; i++) xi(i) = lcg() * (i < 3 ? 2.0 : 1.5);
    if (k == 0) xi.tail<3>().setZero();          // zero-rotation edge case
    if (k == 1) xi.tail<3>() << 3.14159, 0, 0;   // near-pi edge case
    Sophus::SE3d T = Sophus::SE3d::exp(xi);
    Eigen::Matrix4d M = T.matrix();
    Eigen::Matrix<double, 6, 1> l = T.log();
    Eigen::Matrix<double, 6, 6> A = T.Adj();
    printf("se3");
    for (int i = 0; i < 6; i++) printf(" %.17g", xi(i));
    for (int i = 0; i < 16; i++) printf(" %.17g", M(i / 4, i % 4));
    for (int i = 0; i < 6; i++) printf(" %.17g", l(i));
    for (int i = 0; i < 36; i++) printf(" %.17g", A(i / 6, i % 6));
    printf("\n");

    Eigen::Matrix<double, 7, 1> xs;   // Sim3: [upsilon, omega, sigma]
    for (int i = 0; i < 7; i++) xs(i) = lcg() * (i < 3 ? 2.0 : (i < 6 ? 1.5 : 0.5));
    if (k == 0) { xs.segment<3>(3).setZero(); xs(6) = 0.0; }
    Sophus::Sim3d S = Sophus::Sim3d::exp(xs);
    Eigen::Matrix4d Ms = S.matrix();
    Eigen::Matrix<double, 7, 1> ls = S.log();
    printf("sim3");
    for (int i = 0; i < 7; i++) printf(" %.17g", xs(i));
    for (int i = 0; i < 16; i++) printf(" %.17g", Ms(i / 4, i % 4));
    for (int i = 0; i < 7; i++) printf(" %.17g", ls(i));
    printf("\n");
  }
  return 0;
}
