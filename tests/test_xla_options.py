"""Config.xla_options -> jax.jit compiler_options plumbing
(utils/cache.py::compiler_options_from_cfg).

The default tunes the TPU scoped-VMEM budget (the measured flagship
winner, BENCH_NOTES r3 sweep); on the CPU test backend every xla_tpu_*
key must be dropped or the jit compile would fail on an unknown flag —
the whole suite implicitly covers that via make_train_step, this pins
the helper's contract directly.
"""

from llmmil_tpu.config import Config
from llmmil_tpu.utils import compiler_options_from_cfg


def test_default_tpu_option_dropped_on_cpu_backend():
    cfg = Config(modality=["CT"])
    assert any(o.startswith("xla_tpu_scoped_vmem_limit_kib=")
               for o in cfg.xla_options)
    assert compiler_options_from_cfg(cfg) is None


def test_non_tpu_options_pass_through():
    cfg = Config(modality=["CT"],
                 xla_options=["some_generic_opt=7", "xla_tpu_thing=1"])
    assert compiler_options_from_cfg(cfg) == {"some_generic_opt": "7"}


def test_empty_is_none():
    cfg = Config(modality=["CT"], xla_options=[])
    assert compiler_options_from_cfg(cfg) is None
