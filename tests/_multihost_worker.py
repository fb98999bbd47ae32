"""Worker for test_multihost.py: one process of a 2-process CPU cluster.

Usage: python _multihost_worker.py <rank> <port>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from llmmil_tpu.parallel import (global_device_mesh,  # noqa: E402
                                 initialize_from_args, is_primary)

rank, port = int(sys.argv[1]), int(sys.argv[2])
initialize_from_args("127.0.0.1", port, world_size=2, rank=rank)
assert jax.process_count() == 2
assert jax.device_count() == 4          # 2 processes × 2 virtual CPU devices

mesh = global_device_mesh()
# per-process shard of a (4, 4) global batch: rows = global device index
local = np.broadcast_to(
    (rank * 2 + np.arange(2, dtype=np.float32))[:, None], (2, 4)).copy()
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (4, 4))

total = jax.jit(lambda x: x.sum(),
                out_shardings=NamedSharding(mesh, P()))(garr)
print(f"RESULT {float(total)} primary={is_primary()}", flush=True)
