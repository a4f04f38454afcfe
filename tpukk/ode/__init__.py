from .bdf import BDFResult, bdf_solve
from .newton import NewtonResult, newton_solve
from .runge_kutta import ButcherTableau, ODESolverStatus, RKType, rk_solve, tableau
