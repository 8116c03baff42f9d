from .mesh import (chomp_solve_sharded, ilqr_solve_sharded, make_mesh,
                   mpc_rollout_sharded, multihost_init, replicate,
                   sgpmp_solve_sharded, shard_batch, shard_batch_padded,
                   solve_sharded)
