"""Device-transfer prefetch: overlap host→device copies with compute.

The reference overlaps host work with the device via torch's
``DataLoader(num_workers=16, pin_memory=True)`` + ``.cuda(non_blocking=True)``
(``train_ddp.py:190-196,276-293``); the non-blocking copies ride CUDA streams.
The JAX equivalent here is a small background thread that issues
``jax.device_put`` (itself asynchronous) ``size`` batches ahead of the train
loop, so the transfer of batch *i+1* runs while the jitted step for batch *i*
executes.  This matters doubly on the tunneled TPU in this environment, where
a production CT volume costs ~3.7 s of h2d alone (BENCH_NOTES r2 gotchas):
without prefetch the transfer fully serialises with the ~0.3 s step.

Yields batches whose array leaves are already placed (sharded over the mesh's
'data' axis when a mesh is given) — re-issuing ``device_put`` on them is a
no-copy no-op, so downstream code needs no changes.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax

from .mesh import shard_batch


def prefetch_to_device(iterable: Iterable[Any], size: int = 2,
                       mesh: Optional[Any] = None,
                       axis: str = "data") -> Iterator[Any]:
    """Iterate ``iterable``, transferring up to ``size`` batches ahead.

    Each batch is a pytree (dict) of arrays; non-array entries (e.g. the
    ``ID`` string list) pass through untouched.  Exceptions from the source
    iterator propagate to the consumer; abandoning the generator (break /
    GC) unblocks and stops the worker thread.
    """
    if size <= 0:
        yield from iterable
        return

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _place(batch: Any) -> Any:
        if isinstance(batch, dict):
            arrays = {k: v for k, v in batch.items() if k != "ID"}
            placed = (shard_batch(arrays, mesh, axis) if mesh is not None
                      else jax.tree_util.tree_map(jax.device_put, arrays))
            if "ID" in batch:
                placed["ID"] = batch["ID"]
            if "label" in batch:
                # keep the host-side label too: the train loop's metric
                # drain reads labels on host every batch, and fetching a
                # placed label back costs a d2h round trip (~30 ms through
                # the tunnel) per batch
                placed["_host_label"] = batch["label"]
            return placed
        return (shard_batch(batch, mesh, axis) if mesh is not None
                else jax.tree_util.tree_map(jax.device_put, batch))

    def _put(item: Any) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker() -> None:
        try:
            for batch in iterable:
                if not _put(_place(batch)):
                    return
        except BaseException as e:  # propagate to the consumer
            _put(e)
            return
        _put(_END)

    t = threading.Thread(target=_worker, daemon=True,
                         name="device-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
