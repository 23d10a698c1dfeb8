// Golden-value harness: reference epipolar trace
// (ImmaturePoint::traceOn, ImmaturePoint.cpp:70-415) vs
// sos_slam_tpu/ops/trace.py::trace_points.
//
// A deterministic integer-arithmetic host image (bitwise reproducible in
// numpy) is traced against three shifted copies of itself under pure
// x-translation poses whose true disparity matches the shift, i.e. a
// fronto-parallel plane at inverse depth ID_TRUE. Each round prints the
// full per-point trace state (status machine, idepth interval, best UV,
// pixel interval, quality) so the Python side can assert the same
// evolution from identical inputs.
#include "FullSystem/ImmaturePoint.h"
#include "util/FrameShell.h"
#include "util/globalCalib.h"
#include "util/settings.h"
#include <cmath>
#include <cstdio>
#include <vector>

using namespace dso;

int dso::FrameHessian::instanceCounter = 0;
int dso::CalibHessian::instanceCounter = 0;

static const int W = 256, H = 192;
static const float FX = 200.f, FY = 200.f, CX = 128.f, CY = 96.f;
static const float ID_TRUE = 0.5f;

// smooth value-noise texture: every operation is exact in f32 (integer
// lattice values < 61, dyadic 1/8-step interpolation weights), so numpy
// reproduces it bitwise (shared with harness_residual.cpp)
static float lattice(int a, int b) {
  return (float)(int)(((unsigned)(a * 73856093) ^ (unsigned)(b * 19349663)) %
                      61u);
}
static float tex(int x, int y) {
  int x0 = x >> 3, y0 = y >> 3;
  float fx = (float)(x & 7) * 0.125f, fy = (float)(y & 7) * 0.125f;
  float v00 = lattice(x0, y0), v10 = lattice(x0 + 1, y0);
  float v01 = lattice(x0, y0 + 1), v11 = lattice(x0 + 1, y0 + 1);
  float a = v00 + (v10 - v00) * fx;
  float b = v01 + (v11 - v01) * fx;
  int ramp = (x * 7 + y * 13) % 97;
  if (ramp < 0) ramp += 97;
  return 0.5f * (float)ramp + (a + (b - a) * fy) + 30.0f;
}

static FrameHessian *make_frame(int shift, int id) {
  std::vector<float> img(W * H);
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++) img[x + y * W] = tex(x + shift, y);
  FrameHessian *fh = new FrameHessian();
  FrameShell *sh = new FrameShell();
  sh->id = id;
  fh->shell = sh;
  fh->makeImages(img.data(), nullptr);
  return fh;
}

int main() {
  Eigen::Matrix3f K;
  K << FX, 0.f, CX, 0.f, FY, CY, 0.f, 0.f, 1.f;
  setGlobalCalib(W, H, K);

  FrameHessian *host = make_frame(0, 0);

  // immature points on a grid, fresh (idepth_min=0, idepth_max=NAN)
  std::vector<ImmaturePoint *> pts;
  for (int v = 24; v <= H - 24; v += 16)
    for (int u = 24; u <= W - 24; u += 20) {
      ImmaturePoint *p = new ImmaturePoint(u, v, host, 1.0f, nullptr);
      pts.push_back(p);
      printf("init %d %d %.9g %.9g %.9g %.9g %.9g %.9g\n", u, v, p->energyTH,
             p->gradH(0, 0), p->gradH(0, 1), p->gradH(1, 1), p->weights[0],
             p->weights[7]);
    }

  // three trace rounds with different integer disparities D: target is the
  // host texture shifted by D, pose is x-translation with fx*tx*ID_TRUE=-D
  const int DS[3] = {6, 4, 9};
  for (int r = 0; r < 3; r++) {
    int D = DS[r];
    FrameHessian *target = make_frame(D, r + 1);
    float tx = -(float)D / (FX * ID_TRUE);
    Mat33f KRKi = Mat33f::Identity();  // R = I, same K
    Vec3f Kt(FX * tx, 0.f, 0.f);
    Vec2f aff(1.f, 0.f);

    for (size_t i = 0; i < pts.size(); i++) {
      ImmaturePoint *p = pts[i];
      p->traceOn(target, KRKi, Kt, aff, nullptr, false);
      printf("trace %d %zu %d %.9g %.9g %.9g %.9g %.9g %.9g\n", r, i,
             (int)p->lastTraceStatus, p->idepth_min, p->idepth_max,
             p->lastTraceUV[0], p->lastTraceUV[1], p->lastTracePixelInterval,
             p->quality);
    }
  }
  return 0;
}
