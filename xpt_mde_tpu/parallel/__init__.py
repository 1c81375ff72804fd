from xpt_mde_tpu.parallel.mesh import make_mesh
from xpt_mde_tpu.parallel.multihost import (
    is_main_process,
    local_view,
    lockstep,
    make_multihost_mesh,
)
from xpt_mde_tpu.parallel.sharding import (
    make_parallel_train_step,
    replicate_state,
    shard_batch,
)
