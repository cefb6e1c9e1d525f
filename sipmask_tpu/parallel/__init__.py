from .mesh import (make_mesh, shard_batch, replicate, init_distributed,
                   process_shard_args)
from .collect import collect_results_gather, collect_results_cpu
