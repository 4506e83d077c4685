from .sharded_ba import (
    dryrun_sharded_ba_step,
    make_vi_problem,
    pad_problem_for_mesh,
    solve_ba_sharded,
)

__all__ = [
    "solve_ba_sharded",
    "pad_problem_for_mesh",
    "make_vi_problem",
    "dryrun_sharded_ba_step",
]
