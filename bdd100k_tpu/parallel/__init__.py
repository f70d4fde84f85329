"""L4 parallelism: device mesh, shardings, pjit train/eval steps (SURVEY.md §2.8).

The reference is single-process single-GPU with no distributed path at all;
the TPU-native equivalent is XLA-collective data parallelism over an ICI
mesh: batch sharded on the 'data' axis, params replicated, gradient
all-reduce emitted by the compiler. A 'model' axis is reserved in the mesh
so tensor parallelism can be enabled without API change (SURVEY.md §2.8
"mesh axis reserved").
"""

from bdd100k_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from bdd100k_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    detection_loss,
)
from bdd100k_tpu.parallel.spatial import (
    make_spatial_infer_fn,
    spatial_sharding,
)
