from .mil_pool import mil_pool, mil_pool_reference


def resolve_use_pallas(val, raw_bag: bool) -> bool:
    """Resolve the ``use_pallas`` config knob to a concrete bool.

    Measured ruling (BENCH_NOTES r2): the fused kernel is ~2x XLA when it
    pools a RAW bag straight from HBM (768-d, >=16k instances — the
    clip/concat/wMask baseline architectures) but loses when the pooled
    stream is produced by upstream fused compute (the flagship's 512-d
    post-TwoWay tokens), where XLA folds the gate GEMMs into the producer
    pipeline and the kernel's input materialisation costs more than its
    single-pass saving.

    ``val``: True/False force the path (still gated on a TPU backend);
    ``'auto'`` enables the kernel exactly where it measured faster:
    ``raw_bag`` pooling on TPU.  CLI string forms ('true'/'false'/...) are
    normalised here because the generated parser passes them through as str.
    """
    if isinstance(val, str):
        v = val.strip().lower()
        if v == "auto":
            if not raw_bag:
                return False
        elif v not in ("1", "true", "yes", "on"):
            return False
    elif not val:
        return False
    import jax

    return jax.default_backend() == "tpu"


__all__ = ["mil_pool", "mil_pool_reference", "resolve_use_pallas"]
