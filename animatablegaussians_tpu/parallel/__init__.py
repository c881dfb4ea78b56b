from .data_parallel import (make_mesh, make_dp_train_step,
                            make_dp_train_scan, shard_batch)

__all__ = ["make_mesh", "make_dp_train_step", "make_dp_train_scan",
           "shard_batch"]
