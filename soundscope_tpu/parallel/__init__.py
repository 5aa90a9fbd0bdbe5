from soundscope_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    global_batch,
    init_distributed,
    make_mesh,
    make_multihost_mesh,
    replicated,
    seq_sharding,
)
from soundscope_tpu.parallel.seqshard import (  # noqa: F401
    pad_for_mesh,
    shard_granularity,
    sharded_analyze_fn,
)
