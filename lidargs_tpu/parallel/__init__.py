from .mesh import make_mesh, replicated, frame_sharded
from .shard import dp_train_step, make_dp_trainer
from .runtime import Runtime, RuntimeConfig, init_runtime, frame_schedule
