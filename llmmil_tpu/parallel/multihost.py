"""Multi-host (multi-node) initialisation.

Parity target: the reference's multi-node rendezvous (``train_ddp.py:54-65``,
``config.py:106-116``): ``dist.init_process_group('nccl',
init_method='tcp://{master_IP}:{master_port}', world_size, rank)``.  The
TPU-native equivalent is ``jax.distributed.initialize`` — after it, the SAME
single-program code (make_mesh over ``jax.devices()``, sharded batches,
implicit psum in the jitted step) spans all hosts, with XLA routing
inter-host collectives over DCN and intra-slice ones over ICI.

``initialize_from_args`` maps the reference's flag names onto it 1:1, so a
launch command translates directly.  Exercised end-to-end by
``tests/test_multihost.py``, which forms a real 2-process CPU cluster.
"""

from __future__ import annotations

import jax


def initialize_from_args(master_ip: str, master_port: int,
                         world_size: int, rank: int,
                         local_device_count: int | None = None) -> None:
    """``dist.init_process_group`` equivalent (train_ddp.py:60-65).

    world_size here counts PROCESSES (the reference multiplies by
    ngpus-per-node itself, train_ddp.py:57-59; with jax each process owns
    all its local chips, so no multiplication is needed).
    """
    kw = {}
    if local_device_count is not None:
        kw["num_processes"] = world_size
        try:
            jax.config.update("jax_num_cpu_devices", local_device_count)
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=f"{master_ip}:{master_port}",
        num_processes=world_size, process_id=rank)


def is_primary() -> bool:
    """rank-0 gating for checkpoint/log writes (train_ddp.py:211-213)."""
    return jax.process_index() == 0


def global_device_mesh(axis: str = "data"):
    """1-D data mesh over every chip of every host."""
    from .mesh import make_mesh
    return make_mesh((-1,), (axis,))
