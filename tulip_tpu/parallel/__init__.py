from . import dist
from .mesh import (
    make_mesh, shard_batch, replicate, data_sharding, init_distributed_mode,
)
