from .preintegration import ImuNoise, Preintegration, preintegrate, imu_residual
