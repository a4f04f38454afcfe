from .bdf import BDFAdaptiveResult, BDFResult, bdf_solve, bdf_solve_adaptive
from .newton import NewtonResult, newton_solve
from .runge_kutta import ButcherTableau, ODESolverStatus, RKType, rk_solve, tableau
