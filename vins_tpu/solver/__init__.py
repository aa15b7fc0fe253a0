from .problem import WindowState, FeatureObs, Prior, Layout
from .gn import solve_window, SolverOptions
from .marginalize import marginalize_old, marginalize_second_new
