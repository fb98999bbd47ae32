"""Capture bf16 flagship goldens on the TPU (VERDICT r2 #3).

Runs the tiny-flagship golden config (tests/test_golden.py::_tiny_flagship)
with ``compute_dtype='bfloat16'`` — the production compute path — on the
attached TPU, printing:

- the [probs, probs_CT, probs_Pth] tensor to embed in
  tests/test_golden_bf16.py;
- the bf16-vs-fp32 drift (max |Δ| on the probs) on the same device, the
  measured basis for the drift-bound tolerance.

Run me BEFORE touching conv kernels; the recorded values lock the bf16
production numerics so a Mosaic kernel regression cannot pass silently.
"""

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from test_golden import _tiny_flagship
    from llmmil_tpu.models import build_model

    print("devices:", jax.devices(), file=sys.stderr)
    cfg32, batch = _tiny_flagship()
    out = {}
    for tag, dtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        cfg = cfg32.replace(compute_dtype=dtype)
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch)
        o = model.apply(variables, batch)
        out[tag] = np.asarray(
            jnp.stack([o["probs"], o["probs_CT"], o["probs_Pth"]]),
            dtype=np.float64)
        print(f"{tag} done", file=sys.stderr)

    # gradient lock: per-branch |grad| sums of a probs-sum loss in bf16 —
    # locks the BACKWARD path (conv gradient kernels) too, which forward
    # goldens cannot see
    cfg = cfg32.replace(compute_dtype="bfloat16")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    stats = {k: v for k, v in variables.items() if k != "params"}

    def loss(p):
        o = model.apply({"params": p, **stats}, batch, train=False)
        return (jnp.sum(o["probs"]) + jnp.sum(o["probs_CT"])
                + jnp.sum(o["probs_Pth"])).astype(jnp.float32)

    g = jax.grad(loss)(variables["params"])
    gnorms = {
        k: float(sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                     for v in jax.tree_util.tree_leaves(sub)))
        for k, sub in g.items()}
    print("grads done", file=sys.stderr)

    drift = float(np.max(np.abs(out["bf16"] - out["fp32"])))

    # --- trained-state goldens (VERDICT r3 #7): 20 fp32 steps, loss
    # descending, then the bf16/fp32 forward from the SAME params — the
    # trained state shrinks the rounding amplification of the random
    # init, so its lock can be far tighter than the untrained 0.02
    from test_golden import _trained_tiny_flagship
    tcfg32, tbatch, tvars, losses = _trained_tiny_flagship()
    print(f"trained losses: {losses[0]:.4f} -> {losses[-1]:.4f}",
          file=sys.stderr)
    tout = {}
    for tag, dtype in (("fp32", "float32"), ("bf16", "bfloat16")):
        tmodel = build_model(tcfg32.replace(compute_dtype=dtype))
        o = tmodel.apply(tvars, tbatch)
        tout[tag] = np.asarray(
            jnp.stack([o["probs"], o["probs_CT"], o["probs_Pth"]]),
            dtype=np.float64)
    tdrift = float(np.max(np.abs(tout["bf16"] - tout["fp32"])))

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "golden_bf16": out["bf16"].tolist(),
        "golden_fp32": out["fp32"].tolist(),
        "grad_branch_norms_bf16": gnorms,
        "max_drift_bf16_vs_fp32": drift,
        "trained_losses": losses,
        "trained_golden_bf16": tout["bf16"].tolist(),
        "trained_golden_fp32": tout["fp32"].tolist(),
        "trained_max_drift_bf16_vs_fp32": tdrift,
    }, indent=1))


if __name__ == "__main__":
    main()
