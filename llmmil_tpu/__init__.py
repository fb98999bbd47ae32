"""llmmil_tpu — TPU-native LLM-guided multimodal MIL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
KyleKWKim/LLM-guided-Multimodal-MIL (MICCAI 2024): 5-year overall-survival
prediction of lung-cancer patients from CT volumes, pathology patch-feature
bags, and CLIP-encoded clinical prompts, fused by two-way cross-attention and
MIL aggregation, trained data-parallel over a TPU mesh.
"""

from .config import Config, parse_config

__version__ = "0.1.0"
__all__ = ["Config", "parse_config"]
