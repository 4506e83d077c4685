from .sharded_ba import (
    dryrun_sharded_ba_step,
    sharded_ba_step,
    sharded_reproj_normal_eq,
)

__all__ = [
    "sharded_reproj_normal_eq",
    "sharded_ba_step",
    "dryrun_sharded_ba_step",
]
