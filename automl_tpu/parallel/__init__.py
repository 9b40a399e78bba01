from automl_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, mesh_sharding, shard_batch, replicate,
)
