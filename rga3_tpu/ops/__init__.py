from . import losses, rope, seg_gather, resize  # noqa: F401
