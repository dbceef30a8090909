from .mesh import (
    batch_spec,
    make_mesh,
    packed_param_specs,
    param_specs,
    shard_params,
)
from .pipeline import (
    make_pp_mesh,
    pipeline_forward,
    pp_param_specs,
    shard_params_pp,
)

__all__ = [
    "batch_spec",
    "make_mesh",
    "packed_param_specs",
    "param_specs",
    "shard_params",
    "make_pp_mesh",
    "pipeline_forward",
    "pp_param_specs",
    "shard_params_pp",
]
