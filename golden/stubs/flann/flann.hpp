// Harness stub for the flann surface ScanContext.cpp uses
// (Matrix, L2, SearchParams, Index::{size,knnSearch,addPoints}).
// The index is a brute-force exact L2 search — flann semantics (squared
// distances, ascending order) without the approximate kd-tree, so the
// reference's search_ringkey margin/threshold logic runs unmodified.
#pragma once
#include <algorithm>
#include <cassert>
#include <cfloat>
#include <cstddef>
#include <numeric>
#include <unordered_map>
#include <vector>

namespace flann {

template <typename T> struct Matrix {
  T *data;
  size_t rows, cols;
  Matrix() : data(nullptr), rows(0), cols(0) {}
  Matrix(T *d, size_t r, size_t c) : data(d), rows(r), cols(c) {}
  T *operator[](size_t i) const { return data + i * cols; }
};

template <typename T> struct L2 {
  typedef T ElementType;
  typedef T ResultType;
};

struct SearchParams {
  SearchParams(int = 32) {}
};

struct KDTreeIndexParams {
  KDTreeIndexParams(int = 4) {}
};

template <typename Distance> class Index {
  typedef typename Distance::ElementType T;
  std::vector<std::vector<T>> pts_;

public:
  Index() {}
  Index(const Matrix<T> &m, const KDTreeIndexParams & = KDTreeIndexParams()) {
    addPoints(m);
  }
  void buildIndex() {}
  size_t size() const { return pts_.size(); }
  void addPoints(const Matrix<T> &m) {
    for (size_t i = 0; i < m.rows; i++)
      pts_.emplace_back(m[i], m[i] + m.cols);
  }
  void knnSearch(const Matrix<T> &q, Matrix<int> &idces, Matrix<T> &dists,
                 size_t knn, const SearchParams &) {
    std::vector<std::pair<T, int>> d2(pts_.size());
    for (size_t i = 0; i < pts_.size(); i++) {
      T s = 0;
      for (size_t j = 0; j < q.cols; j++) {
        T d = pts_[i][j] - q[0][j];
        s += d * d;
      }
      d2[i] = {s, (int)i};
    }
    std::sort(d2.begin(), d2.end());
    for (size_t k = 0; k < knn; k++) {
      idces[0][k] = k < d2.size() ? d2[k].second : -1;
      dists[0][k] = k < d2.size() ? d2[k].first : (T)1e30;
    }
  }
};

}  // namespace flann
