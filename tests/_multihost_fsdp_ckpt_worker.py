"""Worker for test_multihost.py::test_fsdp_checkpoint_gather — one process
of a 2-process CPU cluster that checkpoints a multi-host FSDP-sharded
train state (no single process can address the whole parameter).

Usage: python _multihost_fsdp_ckpt_worker.py <rank> <port> <save_dir>
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from llmmil_tpu.parallel import global_device_mesh, \
    initialize_from_args  # noqa: E402
from llmmil_tpu.parallel.fsdp import shard_state  # noqa: E402
from llmmil_tpu.train import checkpoint as ckpt_lib  # noqa: E402
from llmmil_tpu.train.state import TrainState  # noqa: E402

rank, port, save_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
initialize_from_args("127.0.0.1", port, world_size=2, rank=rank)
assert jax.device_count() == 4          # 2 processes x 2 devices

# deterministic params, same on both hosts pre-sharding
params = {"w": jnp.asarray(np.arange(4 * 512, dtype=np.float32)
                           .reshape(4, 512)),
          "b": jnp.asarray(np.arange(4096, dtype=np.float32) * 0.5)}
state = TrainState.create(apply_fn=lambda *a: None, params=params,
                          tx=optax.adam(1e-3))
mesh = global_device_mesh()
state, shardings = shard_state(state, mesh, "data", min_size=64)
# both big leaves span the 4 devices = 2 processes -> not addressable
assert not state.params["w"].is_fully_addressable
assert not state.params["b"].is_fully_addressable

# sync path: collective gather before the rank gate
path = ckpt_lib.save_checkpoint(state, save_dir, epoch=0)
# async path: gather synchronous, write in the worker thread
acp = ckpt_lib.AsyncCheckpointer()
acp.save_checkpoint(state, save_dir, epoch=1)
acp.wait()

if jax.process_index() == 0:
    raw0 = ckpt_lib.load_checkpoint(save_dir + "/checkpoint_0000")
    raw1 = ckpt_lib.load_checkpoint(save_dir + "/checkpoint_0001")
    for raw in (raw0, raw1):
        np.testing.assert_array_equal(raw["params"]["w"],
                                      np.asarray(params["w"]))
        np.testing.assert_array_equal(raw["params"]["b"],
                                      np.asarray(params["b"]))
        # adam moments gathered too (zeros at init, full shape)
        mu = jax.tree_util.tree_leaves(raw["opt_state"])
        assert any(np.shape(x) == (4, 512) for x in mu)
print(f"CKPT_OK rank={rank}", flush=True)
