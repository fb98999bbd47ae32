#!/usr/bin/env python
"""PRODUCTION-depth flagship train step: multi-chip compile-only check.

The driver's ``dryrun_multichip`` (131 s budget, 1 CPU core) runs a
shrunken graph (ct_layers=[1,1,1,1], clip_layers=1, twoway_depth=1); the
full-depth flagship had never been *partitioned* on an 8-device mesh
(VERDICT r4 weak-point 4).  This tool AOT-compiles — never executes —
the production-depth train step over the 3-D (data, depth, model) mesh
with the production shardings (DP + depth-sharded CT + Megatron-TP +
FSDP), using abstract ``ShapeDtypeStruct`` inputs so no real arrays (or
the 16 GB of CT activations they imply) are ever materialised:

- SPMD partitioning must succeed at the production tensor shapes;
- the fd-2 capture asserts ZERO "involuntary full rematerialization"
  warnings (the tp.py activation pins hold at full depth);
- the compiled module's per-device memory analysis is printed — the
  sharding/OOM evidence the tiny dryrun can't produce.

Not on the driver's dryrun path (full-depth XLA codegen on one core is
minutes); run it whenever the sharding rules or the flagship graph
change:  ``python scripts/dryrun_fulldepth.py [--devices 8]
[--depth 160 --hw 512 --bag 15616]``
"""

import argparse
import contextlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


@contextlib.contextmanager
def _capture_fd2():
    prev = os.dup(2)
    tmp = tempfile.TemporaryFile(mode="w+b")
    os.dup2(tmp.fileno(), 2)
    holder = {}
    try:
        yield holder
    finally:
        os.dup2(prev, 2)
        os.close(prev)
        tmp.seek(0)
        holder["log"] = tmp.read().decode(errors="replace")
        tmp.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--depth", type=int, default=160)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--bag", type=int, default=15616)
    p.add_argument("--batch", type=int, default=0,
                   help="global batch (default: the data-axis size)")
    ns = p.parse_args(argv)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    ge._force_cpu_devices(ns.devices)

    import jax
    import jax.numpy as jnp
    from llmmil_tpu.models import build_model
    from llmmil_tpu.parallel import make_mesh
    from llmmil_tpu.parallel.ep import EP_RULES
    from llmmil_tpu.parallel.tp import DEFAULT_TP_RULES, tp_shardings
    from llmmil_tpu.train import make_train_step
    from llmmil_tpu.train.optim import make_optimizer
    from llmmil_tpu.train.state import TrainState

    n = ns.devices
    assert n >= 8 and n % 4 == 0, "full-depth check wants the 3-D mesh"
    mesh = make_mesh((n // 4, 2, 2), ("data", "depth", "model"))
    # PRODUCTION depth: the run_train.sh:81 configuration — full MC3
    # stages, 12-layer CLIP text tower, twoway_depth 2, 6 pinv iters —
    # plus the composite parallel config of dryrun check 1
    cfg = ge._flagship_cfg(tiny=False).replace(
        compute_dtype="bfloat16",
        ct_shape=[ns.depth, ns.hw, ns.hw], ct_hw_override=ns.hw,
        ct_remat="layer2",
        ct_shard_axis="depth", fsdp_axis="data", tp_axis="model",
        mesh_shape=[n // 4, 2, 2],
        mesh_axes=["data", "depth", "model"])
    model = build_model(cfg)
    b = ns.batch or mesh.shape["data"]

    def struct(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    batch = {
        "input_CT": struct((b, ns.depth, ns.hw, ns.hw, 1), jnp.float32),
        "input_pathology": struct((b, ns.bag, 768), jnp.float32),
        "mask_pathology": struct((b, ns.bag), jnp.bool_),
        "input_CI": struct((b, cfg.n_clinical + 1, cfg.clip_context),
                           jnp.int32),
        "label": struct((b, 2), jnp.float32),
    }
    print(f"mesh {dict(mesh.shape)}  CT {batch['input_CT'].shape}  "
          f"bag {batch['input_pathology'].shape}", flush=True)

    t0 = time.time()
    # batch rides as an eval_shape ARGUMENT (closure ShapeDtypeStructs
    # are not traced — .reshape etc. would fail)
    state_struct = jax.eval_shape(
        lambda rng, bt: TrainState.create(
            apply_fn=model.apply,
            params=(v := model.init(rng, bt, train=False))["params"],
            tx=make_optimizer(cfg, None, 100),
            batch_stats=v.get("batch_stats", {})),
        jax.random.PRNGKey(0), batch)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(state_struct.params))
    print(f"abstract init {time.time() - t0:.1f}s, "
          f"params {n_params / 1e6:.1f}M", flush=True)

    shardings = tp_shardings(state_struct, mesh, "model",
                             rules=DEFAULT_TP_RULES + EP_RULES,
                             fsdp_axis="data")
    step = make_train_step(cfg, donate=False, mesh=mesh,
                           state_shardings=shardings)

    t0 = time.time()
    lowered = step.lower(state_struct, batch,
                         jax.ShapeDtypeStruct((2,), jnp.uint32))
    print(f"lower (trace + StableHLO) {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    with _capture_fd2() as cap:
        compiled = lowered.compile()
    log = cap["log"]
    wall = time.time() - t0
    n_remat = log.count("Involuntary full rematerialization")
    print(f"SPMD partition + compile {wall:.1f}s, "
          f"involuntary-remat warnings: {n_remat}", flush=True)

    try:
        ma = compiled.memory_analysis()
        print(f"per-device memory: args {ma.argument_size_in_bytes / 2**30:.2f} GiB, "
              f"output {ma.output_size_in_bytes / 2**30:.2f} GiB, "
              f"temp {ma.temp_size_in_bytes / 2**30:.2f} GiB, "
              f"peak(gen) {getattr(ma, 'generated_code_size_in_bytes', 0) / 2**20:.1f} MiB code",
              flush=True)
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**30
        print(f"per-device memory estimate: {total:.2f} GiB — an UPPER "
              "bound from the CPU backend's buffer assignment (no TPU "
              "memory-aware scheduling/rematerialization ordering; the "
              "same config measured ~13 GiB live on one real 16 GiB "
              "v5e at batch 1 unsharded).  Use it to DIFF against "
              "previous runs, not as an absolute HBM fit check.",
              flush=True)
    except Exception as e:                      # backend-dependent API
        print(f"(memory analysis unavailable on this backend: {e})")

    if n_remat:
        for line in log.splitlines():
            if "Involuntary" in line:
                print(line[:300], flush=True)
        raise SystemExit(
            f"FAIL: {n_remat} involuntary full rematerializations at "
            "production depth (parallel/tp.py pins insufficient)")
    print("OK: production-depth flagship partitions cleanly on the "
          f"{n}-device (data, depth, model) mesh", flush=True)


if __name__ == "__main__":
    main()
