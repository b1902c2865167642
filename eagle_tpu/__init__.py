"""eagle-tpu: TPU-native speculative decoding with EAGLE-1/2/3 capability.

Public API:

    from eagle_tpu import EagleEngine, EngineConfig, ModelConfig, DraftConfig
    from eagle_tpu.models.hf_loader import load_target, load_draft
"""

from .config import DraftConfig, EngineConfig, ModelConfig, RopeConfig
from .engine.engine import EagleEngine, calibrate_total_tokens

__version__ = "0.1.0"

__all__ = [
    "DraftConfig",
    "EagleEngine",
    "EngineConfig",
    "ModelConfig",
    "RopeConfig",
    "calibrate_total_tokens",
]
