from .config import (  # noqa: F401
    SAM1_VIT_B, SAM1_VIT_H, SAM1_VIT_L, Sam1Config, tiny_sam1_config,
)
from .model import Sam1Model  # noqa: F401
