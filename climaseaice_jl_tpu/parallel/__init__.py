from .stepper import make_distributed_step, make_mesh
from .multihost import (initialize, shard_state, gather_state,
                        save_rank_snapshot, reassemble_rank_snapshots,
                        save_sharded_checkpoint, load_sharded_checkpoint)

__all__ = ["make_distributed_step", "make_mesh",
           "initialize", "shard_state", "gather_state",
           "save_rank_snapshot", "reassemble_rank_snapshots",
           "save_sharded_checkpoint", "load_sharded_checkpoint"]
