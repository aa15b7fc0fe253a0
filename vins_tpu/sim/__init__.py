from .synthetic import SimScene, Trajectory, generate_imu_interval, project_points
