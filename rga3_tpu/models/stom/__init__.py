from .stom import STOM, default_tracker  # noqa: F401
from .cotracker3 import (  # noqa: F401
    CoTracker3Offline,
    CoTracker3Predictor,
    cotracker3_offline_config,
    cotracker3_small_config,
    load_cotracker3,
    save_cotracker3,
    shipped_tracker,
)
from .convert import (  # noqa: F401
    build_cotracker3_from_checkpoint,
    infer_config_from_state_dict,
    load_cotracker3_checkpoint,
)
