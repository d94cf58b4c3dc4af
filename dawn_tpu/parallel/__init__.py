from dawn_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from dawn_tpu.parallel.distributed import (
    host_local_batch_slice, make_global_array, maybe_initialize_distributed,
)
