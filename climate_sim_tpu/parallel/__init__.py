from .mesh import (
    choose_mesh_shape,
    dims_create,
    divisible,
    field_sharding,
    make_mesh,
)
from .halo import build_sharded_advance, exchange_and_pad

__all__ = [
    "choose_mesh_shape",
    "dims_create",
    "divisible",
    "field_sharding",
    "make_mesh",
    "build_sharded_advance",
    "exchange_and_pad",
]
