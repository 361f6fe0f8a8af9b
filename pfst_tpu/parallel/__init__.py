from .mesh import (DATA_AXIS, batch_sharding, get_mesh, init_distributed,
                   make_sharded_train_step, replicate_sharding,
                   shard_batch)

__all__ = [
    'DATA_AXIS', 'get_mesh', 'init_distributed', 'batch_sharding',
    'replicate_sharding', 'shard_batch', 'make_sharded_train_step'
]

from .slide import sharded_slide_inference, window_grid  # noqa: E402

__all__ += ['sharded_slide_inference', 'window_grid']
