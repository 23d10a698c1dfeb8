// Golden-value harness: reference closed-form spline IMU initialization
// (FrameHessian::initializeImu, HessianBlocks.cpp:253-355) + spline
// evaluators vs sos_slam_tpu/models/imu.py::initialize_imu / spline_*.
//
// Builds a deterministic 5-KF window on a cubic trajectory with synthetic
// IMU samples (the reference measurement model), runs initializeImu, and
// prints inputs AND outputs so the Python side consumes identical inputs.
#include "FullSystem/HessianBlocks.h"
#include "util/FrameShell.h"
#include "util/settings.h"
#include <cstdio>
#include <vector>

using namespace dso;

// statics normally defined in FullSystem.cpp (not linked here)
int dso::FrameHessian::instanceCounter = 0;
int dso::CalibHessian::instanceCounter = 0;

// cubic trajectory coefficients (world <- cam): p = L t + Q t^2 + C t^3
static const double L[6] = {0.3, 0.1, 0.2, 0.05, 0.08, -0.04};
static const double Q[6] = {0.05, -0.03, 0.04, 0.02, -0.01, 0.03};
static const double C[6] = {0.01, 0.02, -0.01, 0.005, 0.01, -0.008};
static const double BIAS_G[3] = {0.01, -0.02, 0.015};
static const double KF_DT = 0.25;
static const double IMU_HZ = 200.0;

static SE3 pose_at(double t) {
  Vec3 p, r;
  for (int k = 0; k < 3; k++) {
    p(k) = L[k] * t + Q[k] * t * t + C[k] * t * t * t;
    r(k) = L[3 + k] * t + Q[3 + k] * t * t + C[3 + k] * t * t * t;
  }
  return SE3(SO3::exp(r), p);
}

int main() {
  setting_rot_imu_cam.setIdentity();
  setting_gravity << 0, 0, -9.81;
  setting_enable_imu = true;
  setting_enable_scale_opt = false;   // exercise the scale-LSQ branch

  CalibHessian hcalib;
  std::vector<FrameHessian *> frames;
  std::vector<FrameShell *> shells;
  for (int i = 0; i < 5; i++) {
    double t = i * KF_DT;
    FrameShell *sh = new FrameShell();
    sh->timestamp = t;
    sh->camToWorld = pose_at(t);
    FrameHessian *fh = new FrameHessian();
    fh->shell = sh;
    // IMU samples in (t_prev, t], reference measurement model:
    // acc = R_wc^T (a_w + g) (rot_imu_cam = I), gyro = w_spline + bias
    std::vector<Vec7> samples;
    if (i > 0) {
      int n = (int)(KF_DT * IMU_HZ);
      for (int k = n - 1; k >= 0; k--) {
        double ts = t - (k + 1) / IMU_HZ;
        Vec7 s;
        s(0) = ts;
        Vec3 a_w, w_c, r;
        for (int j = 0; j < 3; j++) {
          a_w(j) = 2 * Q[j] + 6 * C[j] * ts;
          w_c(j) = L[3 + j] + 2 * Q[3 + j] * ts + 3 * C[3 + j] * ts * ts;
          r(j) = L[3 + j] * ts + Q[3 + j] * ts * ts + C[3 + j] * ts * ts * ts;
        }
        Mat33 R_w = SO3::exp(r).matrix();
        Vec3 acc = R_w.transpose() * (a_w + setting_gravity);
        s.segment<3>(1) = acc;
        s.tail<3>() = w_c + Vec3(BIAS_G[0], BIAS_G[1], BIAS_G[2]);
        samples.push_back(s);
        printf("imu %d %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n", i, s(0),
               s(1), s(2), s(3), s(4), s(5), s(6));
      }
    }
    fh->setImuData(samples);
    Mat44 M = sh->camToWorld.matrix();
    printf("pose %d %.17g", i, t);
    for (int k = 0; k < 16; k++) printf(" %.17g", M(k / 4, k % 4));
    printf("\n");
    frames.push_back(fh);
    shells.push_back(sh);
  }
  frames.back()->PRE_worldToCam = shells.back()->camToWorld.inverse();

  bool ok = frames.back()->initializeImu(frames, &hcalib);
  printf("ok %d\n", (int)ok);
  printf("scale %.17g\n", hcalib.getScaleScaled());
  for (int i = 0; i < 5; i++) {
    FrameHessian *fh = frames[i];
    printf("frame %d vel %.17g %.17g %.17g lrot %.17g %.17g %.17g bias", i,
           fh->shell->velInWorld(0), fh->shell->velInWorld(1),
           fh->shell->velInWorld(2), fh->spline_l_rot(0), fh->spline_l_rot(1),
           fh->spline_l_rot(2));
    for (int k = 0; k < 6; k++) printf(" %.17g", fh->imu_bias(k));
    printf(" q");
    for (int k = 0; k < 6; k++) printf(" %.17g", fh->spline_q(k));
    printf(" c");
    for (int k = 0; k < 6; k++) printf(" %.17g", fh->spline_c(k));
    printf("\n");
  }
  // spline evaluators of the base (newest) frame at a few offsets
  FrameHessian *base = frames.back();
  for (double t : {-0.43, -0.2, -0.05, 0.0}) {
    Vec3 a = base->getSplineAcc(t);
    Vec3 g = base->getSplineGryo(t);
    Vec3 tr = base->getSplineTw_c2t(t);
    Mat33 R = base->getSplineR_c_t(t);
    printf("eval %.17g acc %.17g %.17g %.17g gyro %.17g %.17g %.17g tw %.17g "
           "%.17g %.17g R",
           t, a(0), a(1), a(2), g(0), g(1), g(2), tr(0), tr(1), tr(2));
    for (int k = 0; k < 9; k++) printf(" %.17g", R(k / 3, k % 3));
    printf("\n");
  }
  return 0;
}
