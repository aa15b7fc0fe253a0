"""vins_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of VINS-Mono
(HKUST-Aerial-Robotics): sliding-window visual-inertial odometry with IMU
pre-integration, automatic initialization, online extrinsic/temporal
calibration, loop closure and 4-DoF global pose-graph optimization.

Design stance (not a port):
  * fixed shapes + validity masks everywhere (XLA-friendly),
  * pure jitted computations with a thin host pipeline,
  * batched factor evaluation + MXU dense linear algebra instead of Ceres,
  * Pallas kernels for the image front-end hot loops,
  * jax.sharding meshes for multi-sequence / distributed BA scaling.
"""

__version__ = "0.1.0"
