"""Headline benchmark: pathology MIL inference throughput (bags/sec).

Matches BASELINE.json's metric ("bags/sec/chip MIL inference"): the
pathology-only flagship path — fc_pathology 768→512+Tanh, 2-layer
TwoWayTransformer fusion with the clinical embedding, gated-attention MIL
aggregation, classifier head — on CTransPath-sized bags.

- TPU path: this framework, bf16, batched bucket-padded bags, jit.
- Baseline: the same architecture written in torch, run on CPU one bag at a
  time exactly like the reference's eval loop (test_ddp.py:73 forces
  batch_size=1; reference hardware is CUDA which is absent here, so the CPU
  path is the comparable reference number — BASELINE.json's north-star is
  phrased against the same "reference CPU path").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus the
baseline provenance keys ("baseline_threads"=1 pinned,
"baseline_bags_per_sec", "baseline_allcore_bags_per_sec", "nproc") that
make vs_baseline comparable across bench hosts (BENCH_NOTES "baseline
autopsy": the unpinned r1–r3 baseline swung 52× with the host's core
count).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BAG_N = 8192
BATCH = 8
ITERS = 50
FEAT = 768
EMBED = 512
REPS = 5          # timing repetitions per measurement round
MAX_SPREAD = 2.0  # max/min per-rep throughput ratio accepted as clean
MAX_ROUNDS = 4    # re-measure rounds before giving up and taking the median


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def tpu_bags_per_sec() -> float:
    import jax
    from llmmil_tpu.utils import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from llmmil_tpu.config import Config
    from llmmil_tpu.models import build_model

    cfg = Config(modality=["pathology"], model_pathology="ABMIL",
                 aggregator="ABMIL", model_CI="simpleFCs_v1",
                 CI_input_version="v1", loss_point="Last",
                 learnablePrompt=0, compute_dtype="bfloat16")
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = {
        "input_pathology": jnp.asarray(
            rs.randn(BATCH, BAG_N, FEAT), jnp.float32),
        "mask_pathology": jnp.asarray(
            np.arange(BAG_N)[None] < rs.randint(
                BAG_N // 2, BAG_N, (BATCH, 1))),
        "input_CI": jnp.asarray(rs.randn(BATCH, 9), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    # Timing methodology: on this backend (remote-tunneled chip) a host→
    # device round trip costs ~30 ms and block_until_ready does not actually
    # fence, so K data-dependent iterations run inside ONE jit program and
    # a scalar fetch fences the whole chain; throughput is the marginal cost
    # (T(K) − T(1)) / (K − 1).
    def chained(k):
        def f(variables, batch):
            def body(_, carry):
                acc, b = carry
                b = dict(b)
                # true data dependence: the next input depends on the
                # previous output, so XLA cannot CSE the iterations
                b["input_pathology"] = b["input_pathology"] + acc * 1e-12
                probs = model.apply(variables, b, train=False)["probs"]
                return probs.sum(), b
            acc, _ = jax.lax.fori_loop(0, k, body, (0.0, batch))
            return acc
        return jax.jit(f)

    f1, fk = chained(1), chained(1 + ITERS)
    float(f1(variables, batch))                    # compile + warm
    float(fk(variables, batch))

    # Self-validating timing (round-1 lesson: a single (T(K)−T(1)) sample
    # swung 21× between runs under tunnel contention).  Take REPS interleaved
    # (d1, dk) pairs, compute per-pair throughput, and accept the round only
    # when max/min spread < MAX_SPREAD; otherwise re-measure.  The reported
    # value is the median of the last (cleanest) round; the spread is logged
    # to stderr so the JSON line stays the single-line contract.
    best = None  # (spread, throughputs)
    for rnd in range(MAX_ROUNDS):
        thr = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f1(variables, batch))
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fk(variables, batch))
            dk = time.perf_counter() - t0
            thr.append(ITERS * BATCH / max(dk - d1, 1e-9))
        spread = max(thr) / max(min(thr), 1e-9)
        _log(f"bench round {rnd}: per-rep bags/s="
             f"{[round(t, 1) for t in thr]} spread={spread:.2f}x")
        if best is None or spread < best[0]:
            best = (spread, thr)
        if spread < MAX_SPREAD:
            break
        _log("bench: spread too wide (contention?), re-measuring")
    spread, thr = best
    if spread >= MAX_SPREAD:
        _log(f"bench: WARNING spread {spread:.2f}x never settled below "
             f"{MAX_SPREAD}x; reporting the median of the cleanest round")
    return float(np.median(thr))


def torch_cpu_bags_per_sec(max_seconds: float = 20.0,
                           threads: int = 1) -> float:
    """Reference-architecture torch CPU baseline, batch-1 eval loop.

    ``threads`` is PINNED (r1–r3 lesson, BENCH_NOTES "baseline autopsy":
    the unpinned baseline inherited whatever core count the bench host
    had that round and swung 52× — 40.2 → 1045.8 → 2102.1 bags/s for the
    identical workload — making vs_baseline meaningless across rounds).
    threads=1 is the host-independent anchor; the all-core number is
    reported alongside for context."""
    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, heads, rate=1):
            super().__init__()
            self.inner = dim // rate
            self.h = heads
            self.q = nn.Linear(dim, self.inner)
            self.k = nn.Linear(dim, self.inner)
            self.v = nn.Linear(dim, self.inner)
            self.o = nn.Linear(self.inner, dim)

        def forward(self, q, k, v):
            b, n, _ = q.shape
            dh = self.inner // self.h

            def sp(t, m):
                return m(t).reshape(b, -1, self.h, dh).transpose(1, 2)

            qh, kh, vh = sp(q, self.q), sp(k, self.k), sp(v, self.v)
            a = torch.softmax(qh @ kh.transpose(-1, -2) / dh ** 0.5, -1)
            out = (a @ vh).transpose(1, 2).reshape(b, -1, self.inner)
            return self.o(out)

    class Block(nn.Module):
        def __init__(self, dim=EMBED, heads=8, mlp=2048, first=False):
            super().__init__()
            self.first = first
            self.sa = Attention(dim, heads)
            self.c1 = Attention(dim, heads, 2)
            self.c2 = Attention(dim, heads, 2)
            self.mlp = nn.Sequential(nn.Linear(dim, mlp), nn.ReLU(),
                                     nn.Linear(mlp, dim))
            self.n1, self.n2, self.n3, self.n4 = (nn.LayerNorm(dim)
                                                  for _ in range(4))

        def forward(self, q, k, qpe, kpe):
            if self.first:
                q = self.n1(self.sa(q, q, q))
            else:
                q = self.n1(q + self.sa(q + qpe, q + qpe, q))
            q = self.n2(q + self.c1(q + qpe, k + kpe, k))
            q = self.n3(q + self.mlp(q))
            k = self.n4(k + self.c2(k + kpe, q + qpe, q))
            return q, k

    class PathologyMIL(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc_path = nn.Sequential(nn.Linear(FEAT, EMBED), nn.Tanh())
            self.ci = nn.Sequential(nn.Linear(9, 9), nn.ReLU(),
                                    nn.Linear(9, EMBED), nn.ReLU())
            self.ci_proj = nn.Sequential(nn.Linear(EMBED, EMBED), nn.Tanh())
            self.b0 = Block(first=True)
            self.b1 = Block()
            self.final = Attention(EMBED, 8, 2)
            self.nf = nn.LayerNorm(EMBED)
            self.av = nn.Sequential(nn.Linear(EMBED, 192), nn.Tanh())
            self.au = nn.Sequential(nn.Linear(EMBED, 192), nn.Sigmoid())
            self.aw = nn.Linear(192, 1)
            self.head = nn.Linear(EMBED, 2)

        def forward(self, bag, ci, pe):
            k = self.fc_path(bag)
            q = self.ci_proj(self.ci(ci))[:, None, :]
            qpe = q
            q, k = self.b0(q, k, qpe, pe)
            q, k = self.b1(q, k, qpe, pe)
            q = self.nf(q + self.final(q + qpe, k + pe, k))
            x = torch.cat([q, k], 1)[0]
            a = torch.softmax(self.aw(torch.tanh(self.av(x))
                                      * torch.sigmoid(self.au(x))).T, 1)
            return torch.sigmoid(self.head(a @ x))

    torch.set_num_threads(max(int(threads), 1))
    model = PathologyMIL().eval()
    rs = np.random.RandomState(0)
    bag = torch.tensor(rs.randn(1, BAG_N, FEAT), dtype=torch.float32)
    ci = torch.tensor(rs.randn(1, 9), dtype=torch.float32)
    pe = torch.tensor(rs.randn(1, BAG_N, EMBED) * 0.02,
                      dtype=torch.float32)
    with torch.no_grad():
        model(bag, ci, pe)                      # warm-up
        times = []
        for _ in range(4):                      # fixed count: stable median
            t0 = time.perf_counter()
            model(bag, ci, pe)
            times.append(time.perf_counter() - t0)
            if sum(times) > max_seconds:
                break
    return 1.0 / float(np.median(times))


def main():
    import os
    nproc = os.cpu_count() or 1
    # host-independent anchor: single pinned torch thread (reproducible
    # across bench hosts to within core-speed variation, ~2x)
    base_1t = torch_cpu_bags_per_sec(threads=1)
    base_all = (torch_cpu_bags_per_sec(threads=nproc) if nproc > 1
                else base_1t)
    _log(f"baseline: {base_1t:.2f} bags/s @1 thread, "
         f"{base_all:.2f} @ {nproc} threads")
    value = tpu_bags_per_sec()
    print(json.dumps({
        "metric": "pathology_mil_inference_throughput",
        "value": round(value, 2),
        "unit": "bags/s",
        "vs_baseline": round(value / base_1t, 2),
        "baseline_threads": 1,
        "baseline_bags_per_sec": round(base_1t, 3),
        "baseline_allcore_bags_per_sec": round(base_all, 3),
        "nproc": nproc,
    }))


if __name__ == "__main__":
    main()
