"""Solver layer: the MAC Frank-Wolfe solver and the greedy baselines.

Package exports mirror the reference (mac/solvers/__init__.py exports only
MAC and NaiveGreedy; GreedyEig / GreedyESP are importable by module path).
"""

from mac_tpu.solvers.mac import MAC
from mac_tpu.solvers.baseline import NaiveGreedy

__all__ = ["MAC", "NaiveGreedy"]
