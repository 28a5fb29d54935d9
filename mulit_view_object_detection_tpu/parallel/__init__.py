from .mesh import (batch_sharding, make_mesh,  # noqa: F401
                   make_parallel_train_step, replicate_state, shard_batch)
