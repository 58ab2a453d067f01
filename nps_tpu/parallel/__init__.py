from nps_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate, replicated_sharding,
    init_distributed, make_grid_mesh, GridBatchSharding)
from nps_tpu.parallel.tensor import (  # noqa: F401
    make_dp_tp_mesh, param_partition_specs, shard_params, param_shardings)
from nps_tpu.parallel.multihost import (  # noqa: F401
    process_slice, shard_indices_for_process, assemble_global_batch)
from nps_tpu.parallel.pipeline import (  # noqa: F401
    make_dp_pp_mesh, make_pipelined_apply)
from nps_tpu.parallel.expert import (  # noqa: F401
    make_dp_ep_mesh, expert_partition_specs, shard_expert_params)
from nps_tpu.parallel.zero import (  # noqa: F401
    opt_state_specs, shard_opt_state)
