from medmoe_tpu.parallel.mesh import make_mesh, MeshSpec  # noqa: F401
from medmoe_tpu.parallel.sharding import (  # noqa: F401
    param_shardings,
    batch_sharding,
    shard_batch,
)
