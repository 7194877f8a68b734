from .mesh import MeshPlan, make_mesh                     # noqa: F401
from .backend import DistributedBackend, shard_operators  # noqa: F401
