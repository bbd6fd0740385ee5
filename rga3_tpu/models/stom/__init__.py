from .stom import STOM  # noqa: F401
