from nps_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate, replicated_sharding,
    init_distributed, make_grid_mesh, GridBatchSharding)
