from .config import (  # noqa: F401
    QwenTextConfig,
    QwenVisionConfig,
    Qwen25VLConfig,
    QWEN25_VL_3B,
    QWEN25_VL_7B,
    tiny_config,
)
