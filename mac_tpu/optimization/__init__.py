from mac_tpu.optimization.frankwolfe import frank_wolfe, frank_wolfe_with_state, naive_stepsize
from mac_tpu.optimization.constraints import solve_subset_box_lp, solve_box_lp

__all__ = [
    "frank_wolfe",
    "frank_wolfe_with_state",
    "naive_stepsize",
    "solve_subset_box_lp",
    "solve_box_lp",
]
