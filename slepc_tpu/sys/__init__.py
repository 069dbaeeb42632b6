from .options import Options, set_global_options, get_global_options
from .sort import Which, SortCriterion
from .mesh import get_mesh, set_mesh, row_sharding, replicated_sharding, device_put_rows
from .monitor import Monitor, ConvMonitor

__all__ = [
    "Options",
    "set_global_options",
    "get_global_options",
    "Which",
    "SortCriterion",
    "get_mesh",
    "set_mesh",
    "row_sharding",
    "replicated_sharding",
    "device_put_rows",
    "Monitor",
    "ConvMonitor",
]
