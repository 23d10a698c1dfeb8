// Golden-value harness: reference Undistort (src/util/Undistort.cpp) vs
// sos_slam_tpu/io/undistort.py. argv[1] = camera.txt. Prints the output
// calibration K, sizes, and the remap coordinates produced by
// distortCoordinates on a subsampled output grid.
#include "util/Undistort.h"
#include "util/settings.h"
#include <cstdio>
#include <string>
#include <vector>

using namespace dso;

int main(int argc, char **argv) {
  if (argc < 2) return 2;
  Undistort *u = Undistort::getUndistorterForFile(argv[1], "", "");
  if (!u || !u->isValid()) { printf("INVALID\n"); return 1; }
  Mat33 K = u->getK();
  Eigen::Vector2i sz = u->getSize();
  Eigen::Vector2i szo = u->getOriginalSize();
  printf("K %.17g %.17g %.17g %.17g\n", K(0, 0), K(1, 1), K(0, 2), K(1, 2));
  printf("size %d %d org %d %d\n", sz(0), sz(1), szo(0), szo(1));
  // remap sample: every 37th pixel of the output grid (prime stride so the
  // samples spread over the whole frame)
  int w = sz(0), h = sz(1);
  std::vector<float> ix, iy;
  for (int i = 0; i < w * h; i += 37) {
    ix.push_back((float)(i % w));
    iy.push_back((float)(i / w));
  }
  std::vector<float> ox(ix.size()), oy(ix.size());
  u->distortCoordinates(ix.data(), iy.data(), ox.data(), oy.data(),
                        (int)ix.size());
  for (size_t i = 0; i < ix.size(); i++)
    printf("m %g %g %.9g %.9g\n", ix[i], iy[i], ox[i], oy[i]);
  delete u;
  return 0;
}
