from .matcher import TH_HIGH, TH_LOW, Matcher, desc_dist_matrix
from .pnp import PnPSolver
from .sim3_solver import Sim3Solver, horn_sim3

__all__ = [
    "Matcher",
    "TH_HIGH",
    "TH_LOW",
    "desc_dist_matrix",
    "Sim3Solver",
    "horn_sim3",
    "PnPSolver",
]
