from .mesh import (make_mesh, shard_volume, replicate, make_shard_ctx,
                   make_sharded_chunk_runner, solve_phase_sharded,
                   shard_train_state, unshard_train_state,
                   make_zero_sharded_chunk_runner)
