from .hybrid import ImgVidHybridDataset, DATASET_REGISTRY  # noqa: F401
