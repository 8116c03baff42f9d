from .mesh import (make_mesh, mpc_rollout_sharded, multihost_init, replicate,
                   shard_batch, shard_batch_padded, solve_sharded)
