"""xclip-tpu: a TPU-native (JAX/XLA/Pallas/pjit) contrastive language-image
pretraining framework with the full capability surface of lucidrains/x-clip.

Public exports mirror the reference (`x_clip/__init__.py:1`) plus the
functional core and TPU-specific subsystems.
"""

from .api import CLIP
from .model import CLIPModel
from .nn.text import TextTransformer
from .nn.vision import VisionTransformer
from .objectives.mlm import MLM
from .objectives.ssl import SimCLR, SimSiam

__version__ = "0.1.0"

__all__ = [
    "CLIP", "CLIPModel", "TextTransformer", "VisionTransformer",
    "MLM", "SimSiam", "SimCLR",
]
