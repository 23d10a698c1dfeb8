// Harness stub: the tiny cv::Mat surface ScaleOptimizer.cpp:58-62 uses to
// convert a row-major vector<double> into an Eigen 4x4.
#pragma once
#include <cstddef>
#include <vector>

namespace cv {

class Mat {
public:
  std::vector<double> data;
  int rows = 0, cols = 1;
  Mat() {}
  Mat(const std::vector<double> &v)
      : data(v), rows((int)v.size()), cols(1) {}
  Mat reshape(int, int r) const {
    Mat m(*this);
    m.rows = r;
    m.cols = (int)data.size() / r;
    return m;
  }
};

}  // namespace cv
