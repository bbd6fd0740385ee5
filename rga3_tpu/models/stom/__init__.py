from .stom import STOM  # noqa: F401
from .cotracker3 import (  # noqa: F401
    CoTracker3Offline,
    CoTracker3Predictor,
    cotracker3_offline_config,
)
from .convert import load_cotracker3_checkpoint  # noqa: F401
