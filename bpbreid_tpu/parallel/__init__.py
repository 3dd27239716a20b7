from bpbreid_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_array,
    shard_batch_spec,
)
from bpbreid_tpu.parallel.retrieval import (
    pad_to_multiple,
    sharded_bp_distance,
    sharded_cmc_map,
)
from bpbreid_tpu.parallel.train import distribute_engine
