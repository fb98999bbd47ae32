from .test_driver import evaluate, roc_curve_plot

__all__ = ["evaluate", "roc_curve_plot"]
