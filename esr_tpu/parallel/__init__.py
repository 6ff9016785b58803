from esr_tpu.parallel.mesh import make_mesh, replicated, batch_sharding
from esr_tpu.parallel.dp import make_dp_train_step, shard_batch
from esr_tpu.parallel.pipeline import (
    make_stage_mesh,
    pipelined_rrdb_apply,
    pipelined_trunk,
)
from esr_tpu.parallel.tensor import (
    make_spatial_tp_mesh,
    make_tp_mesh,
    spatial_tp_apply,
    tp_rrdb_apply,
    tp_trunk,
)
from esr_tpu.parallel.spatial import (
    spatial_fold_apply,
    spatial_sharded_forward,
    spatial_window_forward,
    tiled_forward,
)
