from arco_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, batch_sharding, replicate_sharding, shard_batch)
