from .mesh import (DATA_AXIS, batch_sharding, get_mesh, init_distributed,
                   make_sharded_train_step, replicate_sharding,
                   shard_batch)

__all__ = [
    'DATA_AXIS', 'get_mesh', 'init_distributed', 'batch_sharding',
    'replicate_sharding', 'shard_batch', 'make_sharded_train_step'
]

from .slide import sharded_slide_inference, window_grid  # noqa: E402

__all__ += ['sharded_slide_inference', 'window_grid']

from . import tp  # noqa: E402
from .tp import (MODEL_AXIS, get_2d_mesh,  # noqa: E402
                 make_tp_train_step, shard_state)

__all__ += ['tp', 'MODEL_AXIS', 'get_2d_mesh', 'make_tp_train_step',
            'shard_state']

from . import pp  # noqa: E402
from .pp import PIPE_AXIS, get_pipe_mesh, gpipe_apply  # noqa: E402

__all__ += ['pp', 'PIPE_AXIS', 'get_pipe_mesh', 'gpipe_apply']

from . import ep  # noqa: E402
from .ep import EXPERT_AXIS, get_expert_mesh, moe_apply  # noqa: E402

__all__ += ['ep', 'EXPERT_AXIS', 'get_expert_mesh', 'moe_apply']

from . import zero  # noqa: E402
from .zero import (make_zero_train_step, opt_state_bytes,  # noqa: E402
                   zero_specs)

__all__ += ['zero', 'make_zero_train_step', 'opt_state_bytes',
            'zero_specs']
