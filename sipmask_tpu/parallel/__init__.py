from .mesh import (make_mesh, shard_batch, replicate, init_distributed,
                   process_shard_args)
