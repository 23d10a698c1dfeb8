// Harness stub replacing src/LoopClosure/LoopHandler.h, whose real version
// drags in ROS/flann/g2o/PCL/Pangolin.
//
// Consumers and what they need from it:
//  - FullSystem.h:46 — only the IOWrap::Output3DWrapper type (vector
//    member, FullSystem.h:142) and the LoopHandler name;
//  - ScanContext.{h,cpp} — dso::SE3 (NumType.h), g2o::SE3Quat, and the
//    three LoopFrame fields generate/search_sc touch (signature,
//    tfm_sc_rig, pts_sc; real struct at LoopHandler.h:73-117).
#pragma once
#include <utility>
#include <vector>

#include "g2o_sc_stub.hpp"
#include "util/NumType.h"

namespace dso {

struct LoopFrame {
  EIGEN_MAKE_ALIGNED_OPERATOR_NEW
  int kf_id = 0;
  std::vector<std::pair<int, double>> signature;
  g2o::SE3Quat tfm_sc_rig;
  std::vector<Eigen::Vector3d> pts_sc;
};

namespace IOWrap {
class LoopHandler;
}  // namespace IOWrap
}  // namespace dso

// FullSystem.h relies on this header having pulled in the publisher API
#include "IOWrapper/Output3DWrapper.h"
