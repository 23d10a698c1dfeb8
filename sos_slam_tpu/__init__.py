"""sos_slam_tpu — a TPU-native (JAX/XLA/Pallas) stereo visual-inertial SLAM framework.

A from-scratch rebuild of the capabilities of SOS-SLAM (Scale Optimized Spline
SLAM, DSO lineage): direct sparse odometry over a sliding keyframe window,
stereo 1-DoF metric-scale optimization, continuous-time cubic-spline VIO, and
LiDAR-descriptor (Scan Context) loop closure with a Sim(3)/SE(3) pose graph.

Design stance (TPU-first, not a port):
  * State lives in fixed-shape arrays (padded + masked), never pointer graphs.
  * All compute paths are pure jitted functions; dynamic control flow becomes
    `lax.while_loop` / masking; per-point early exits become masked lanes.
  * Hot kernels (pyramid warp + residual + H,b reduction, epipolar trace,
    Hessian/Schur accumulation) are batched XLA einsums / Pallas kernels.
  * The host driver is a thin Python layer: dataset IO, time alignment,
    loop-closure thread, `poses.txt` output.

Reference behavior parity is cited per-module as `/root/reference/<file>:<line>`.
"""

__version__ = "0.1.0"

from sos_slam_tpu.utils.config import Settings, default_settings  # noqa: F401
