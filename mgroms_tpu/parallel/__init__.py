from .mesh import MeshPlan, make_mesh                     # noqa: F401
from .backend import DistributedBackend, shard_operators  # noqa: F401
from .exchange import halo_extend, block_extended         # noqa: F401
from .shardmap_backend import (                           # noqa: F401
    ShardMapBackend, shard_operators_blocked)
from .physics import DistributedPhysics                   # noqa: F401
