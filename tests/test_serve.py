"""HTTP inference daemon (eval/serve.py) over a serving artifact.

Invariants:
- served probs are byte-identical to ``ServingModel.call`` on the same
  artifact (same compiled entry, same platform);
- warmup touches every exported signature before the socket opens;
- an unknown signature is a 400 listing the available signatures, a
  malformed body is a 400, an unknown route is a 404 — the daemon stays
  up through all of them;
- /healthz and /signatures describe the artifact.
"""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import jax

from llmmil_tpu.config import Config
from llmmil_tpu.eval.export import ServingModel, export_model
from llmmil_tpu.eval.serve import InferenceServer, warmup_batches
from llmmil_tpu.models import build_model


def _cfg():
    return Config(modality=["pathology"], model_pathology="ABMIL",
                  aggregator="ABMIL", model_CI="simpleFCs_v1",
                  CI_input_version="v1", loss_point="Last",
                  compute_dtype="float32", learnablePrompt=0,
                  bag_buckets=[16, 32])


def _batch(cfg, B, N, seed=0):
    rs = np.random.RandomState(seed)
    return {"input_pathology": rs.randn(B, N, 768).astype(np.float32),
            "mask_pathology": np.arange(N)[None].repeat(B, 0)
            < rs.randint(N // 2, N, (B, 1)),
            "input_CI": rs.rand(B, 9).astype(np.float32)}


def _post(url, arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url, data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.load(r)


def test_serve_predict_matches_direct_call():
    cfg = _cfg()
    model = build_model(cfg)
    ex16, ex32 = _batch(cfg, 1, 16), _batch(cfg, 1, 32)
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree.map(jax.numpy.asarray, ex16))
    served = ServingModel(
        export_model(cfg, variables, [ex16, ex32], platforms=("cpu",)))

    # warmup covers every signature
    assert {k for k, _ in warmup_batches(served)} \
        == set(served.signatures)

    with InferenceServer(served) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        code, health = urllib.request.urlopen(
            f"{base}/healthz", timeout=30).status, None
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.load(r)
        assert code == 200 and health["status"] == "ok"
        assert sorted(health["signatures"]) == sorted(served.signatures)

        with urllib.request.urlopen(f"{base}/signatures",
                                    timeout=30) as r:
            assert json.load(r) == served.signatures

        for ex in (ex16, ex32, _batch(cfg, 1, 32, seed=3)):
            code, out = _post(f"{base}/predict", ex)
            want = np.asarray(served.call(ex))
            assert code == 200
            np.testing.assert_array_equal(
                np.asarray(out["probs"], np.float32), want)
            assert out["device_ms"] >= 0

        # unknown signature -> 400 listing what's available
        try:
            _post(f"{base}/predict", _batch(cfg, 2, 24))
            raise AssertionError("unknown signature not rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "available" in json.load(e)["error"]

        # malformed body -> 400; unknown route -> 404; server stays up
        req = urllib.request.Request(f"{base}/predict",
                                     data=b"not an npz")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("malformed body not rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            raise AssertionError("unknown route not rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # oversized Content-Length -> 413 before the body is read
        req = urllib.request.Request(
            f"{base}/predict", data=b"x",
            headers={"Content-Length": str(srv._max_body + 1)})
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("oversized body not rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert "cap" in json.load(e)["error"]
        except urllib.error.URLError:
            pass  # server may drop the connection on the length mismatch

        code, out = _post(f"{base}/predict", ex16)   # still serving
        assert code == 200
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] >= 5 and stats["errors"] == 2
