"""Hybrid dataset mixer: normalized sample-rate multinomial choice per item
(ref: utils/dataset.py:137-408 ImgVidHybridDataset; fixed samples_per_epoch
= bs * accum * steps * world_size — train_joint.py:255-260)."""
from __future__ import annotations

import random
import threading
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..collate import TrainSample
from .base import TaskDataset
from .image_seg import ReasonSegDataset, ReferSegDataset, SemSegDataset
from .qa import (
    ReferVQADataset, ReferVideoQADataset, VideoQADataset, VQADataset,
)
from .video_seg import VideoExpressionDataset, YTVOSDataset


def _mevis(base_dir, **kw):
    import os

    return VideoExpressionDataset(
        os.path.join(base_dir, "mevis"), splits=("train", "valid_u"), **kw
    )


def _refer_vos(base_dir, **kw):
    import os

    return VideoExpressionDataset(
        os.path.join(base_dir, "refer_youtube_vos"), splits=("train",), **kw
    )


def _revos(base_dir, **kw):
    import os

    return VideoExpressionDataset(
        os.path.join(base_dir, "revos"), splits=("train",), **kw
    )


def _ref_davis(base_dir, **kw):
    import os

    return VideoExpressionDataset(
        os.path.join(base_dir, "ref_davis"), splits=("train",), **kw
    )


DATASET_REGISTRY: Dict[str, Callable[..., TaskDataset]] = {
    "sem_seg": SemSegDataset,
    "refer_seg": ReferSegDataset,
    "reason_seg": ReasonSegDataset,
    "vqa": VQADataset,
    "videoqa": VideoQADataset,
    "refer_vqa": ReferVQADataset,
    "refer_videoqa": ReferVideoQADataset,
    "mevis": _mevis,
    "refer_vos": _refer_vos,
    "revos": _revos,
    "ref_davis": _ref_davis,
    "vos": YTVOSDataset,
}


class ImgVidHybridDataset:
    def __init__(
        self,
        base_dir: str,
        datasets: Sequence[str],
        sample_rates: Sequence[float],
        samples_per_epoch: int,
        seed: int = 0,
        **dataset_kwargs,
    ):
        assert len(datasets) == len(sample_rates)
        self.samples_per_epoch = samples_per_epoch
        self.all_datasets: List[TaskDataset] = []
        rates: List[float] = []
        for name, rate in zip(datasets, sample_rates):
            if name not in DATASET_REGISTRY:
                raise KeyError(f"unknown dataset {name!r}")
            ds = DATASET_REGISTRY[name](base_dir, **dataset_kwargs)
            if len(ds) == 0:
                continue  # dataset not present on disk
            self.all_datasets.append(ds)
            rates.append(rate)
        if not self.all_datasets:
            raise FileNotFoundError(
                f"no datasets found under {base_dir} for {datasets}"
            )
        r = np.asarray(rates, np.float64)
        self.rates = r / r.sum()
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self._global_lock = threading.Lock()

    def __len__(self):
        return self.samples_per_epoch

    def __getitem__(self, idx) -> TrainSample:
        ds = self.all_datasets[
            int(self.rng.choice(len(self.all_datasets), p=self.rates))
        ]
        return ds.sample()

    def sample_global(self, global_idx: int) -> TrainSample:
        """Deterministic sample as a pure function of (seed, global_idx).

        Multi-host training requires every host to agree on the content of
        global batch row k (the replicated vision arrays carry tokens from
        ALL rows), so instead of the reference's per-rank DataLoader RNG
        (train_joint.py:336-346) the global sample index seeds both the
        dataset-choice RNG and the stdlib/np global RNGs the per-task
        samplers draw from. Also makes single-host batch composition
        reproducible under threaded prefetch.
        """
        import random as _random

        # the per-task samplers draw from the process-global random/np
        # RNGs, so seeding + sampling must be atomic under threaded
        # prefetch or interleaved draws would desync hosts
        with self._global_lock:
            ss = np.random.SeedSequence([self.seed, int(global_idx)])
            s_choice, s_py, s_np = ss.generate_state(3)
            rng = np.random.default_rng(s_choice)
            _random.seed(int(s_py))
            np.random.seed(int(s_np) % 2**32)
            ds = self.all_datasets[
                int(rng.choice(len(self.all_datasets), p=self.rates))
            ]
            return ds.sample()
