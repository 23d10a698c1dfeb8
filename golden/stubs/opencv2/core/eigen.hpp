// Harness stub: cv2eigen for the 4x4 stereo-transform conversion.
#pragma once
#include <Eigen/Core>

#include "opencv2/core/core.hpp"

namespace cv {

template <typename T, int R, int C>
void cv2eigen(const Mat &m, Eigen::Matrix<T, R, C> &dst) {
  for (int r = 0; r < m.rows; r++)
    for (int c = 0; c < m.cols; c++)
      dst(r, c) = (T)m.data[r * m.cols + c];
}

}  // namespace cv
