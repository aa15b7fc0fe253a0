# sliding-window estimator: feature DB, fused VIO step, initializer, state machine
