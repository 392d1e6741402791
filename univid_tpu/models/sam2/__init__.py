"""SAM2 video segmenter (TPU-native): Hiera encoder, promptable mask
decoder, streaming memory, and the reference-compatible video
predictor + animate-preprocess mask_fn adapter."""

from .hiera import HieraConfig, NeckConfig
from .memory import MemoryConfig
from .predictor import (Sam2Config, Sam2VideoPredictor, build_sam2_mask_fn,
                        init_sam2, tiny_sam2_config)
from .sam_heads import SamHeadConfig
