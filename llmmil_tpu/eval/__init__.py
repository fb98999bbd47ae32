from .test_driver import evaluate, roc_curve_plot
from .saliency import (saliency_map, grad_cam, pathology_attention,
                       save_patient_maps)

__all__ = ["evaluate", "roc_curve_plot", "saliency_map", "grad_cam",
           "pathology_attention", "save_patient_maps"]
