from .mesh import (
    batch_spec,
    make_mesh,
    packed_param_specs,
    param_specs,
    shard_params,
)

__all__ = [
    "batch_spec",
    "make_mesh",
    "packed_param_specs",
    "param_specs",
    "shard_params",
]
