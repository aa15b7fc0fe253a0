# initialization: relative pose, SfM, visual-inertial alignment, extrinsic calib
