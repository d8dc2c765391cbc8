from .mesh import make_mesh, replicated_spec
from .data_parallel import (
    make_dp_loss_fn,
    make_dp_train_step,
    put_sharded,
    stack_shards,
)

__all__ = [
    "make_mesh",
    "replicated_spec",
    "make_dp_loss_fn",
    "make_dp_train_step",
    "put_sharded",
    "stack_shards",
]
