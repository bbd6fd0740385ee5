"""Multi-host initialization + cross-host utilities.

TPU-native replacement for the reference's torchrun/NCCL process-group
setup (ref: train_joint.py:132-134, run_torchrun.sh:6-23). On TPU pods,
jax.distributed discovers peers from the environment; DP ranks map across
DCN (multi-slice) while fsdp/tensor axes stay within ICI (SURVEY.md §2.9).
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-host; returns
    process_index. Single-host is a no-op (the common eval-shard case)."""
    import jax

    explicit = coordinator_address is not None
    env = os.environ.get("COORDINATOR_ADDRESS")
    if explicit or env or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address or env,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def rank0_print(*args, **kwargs):
    """(ref utils/utils.py:190-193)"""
    import jax

    if jax.process_index() == 0:
        print(*args, **kwargs, flush=True)


def barrier(name: str = "barrier"):
    """Cross-host sync point (ref dist.barrier around checkpoint writes,
    train_joint.py:427-431)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
