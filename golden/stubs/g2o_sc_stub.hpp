// Harness stub for g2o::SE3Quat — only the surface ScanContext.cpp and the
// LoopFrame struct use: construction from (R, t), point transform, inverse.
#pragma once
#include <Eigen/Core>
#include <Eigen/Geometry>

namespace g2o {

class SE3Quat {
  Eigen::Quaterniond r_;
  Eigen::Vector3d t_;

public:
  EIGEN_MAKE_ALIGNED_OPERATOR_NEW
  SE3Quat() : r_(Eigen::Quaterniond::Identity()), t_(0, 0, 0) {}
  SE3Quat(const Eigen::Matrix3d &R, const Eigen::Vector3d &t)
      : r_(R), t_(t) {
    r_.normalize();
  }
  Eigen::Vector3d operator*(const Eigen::Vector3d &p) const {
    return r_ * p + t_;
  }
  SE3Quat inverse() const {
    SE3Quat out;
    out.r_ = r_.conjugate();
    out.t_ = -(out.r_ * t_);
    return out;
  }
  const Eigen::Quaterniond &rotation() const { return r_; }
  const Eigen::Vector3d &translation() const { return t_; }
};

}  // namespace g2o
