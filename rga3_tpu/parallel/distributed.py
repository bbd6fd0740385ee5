"""Multi-host initialization + cross-host utilities.

TPU-native replacement for the reference's torchrun/NCCL process-group
setup (ref: train_joint.py:132-134, run_torchrun.sh:6-23). On TPU pods,
jax.distributed discovers peers from the environment; DP ranks map across
DCN (multi-slice) while fsdp/tensor axes stay within ICI (SURVEY.md §2.9).

The batch-feed helpers below are the jax equivalent of the reference's
per-rank DataLoader shards: each host materializes its rows and
`jax.make_array_from_process_local_data` assembles the global array
(`put_global`).
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
    platform: Optional[str] = None,
) -> int:
    """Initialize jax.distributed when running multi-host; returns
    process_index. Single-host is a no-op (the common eval-shard case).

    Must be called before any other jax use in the process (backend
    options cannot change once initialized).

    ``local_device_count``/``platform`` exist for multi-process CPU runs
    (tests, dry runs): they force N virtual host devices and the cpu
    backend with cross-process gloo collectives — the same code path a
    real pod takes, minus the ICI.
    """
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count="
                f"{local_device_count}"
            ).strip()

    import jax

    platform = platform or os.environ.get("RGA3_PLATFORM")
    if platform:
        # this machine's sitecustomize force-registers a remote TPU
        # backend; env vars alone don't override it, jax.config does
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")

    explicit = coordinator_address is not None
    env = os.environ.get("COORDINATOR_ADDRESS")
    if explicit or env or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        if num_processes is None and os.environ.get("NUM_PROCESSES"):
            num_processes = int(os.environ["NUM_PROCESSES"])
        if process_id is None and os.environ.get("PROCESS_ID"):
            process_id = int(os.environ["PROCESS_ID"])
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


def broadcast_scalar(value, src_has_value: bool = True) -> float:
    """Broadcast a host scalar from process 0 to all processes (used for
    the val metric that only rank 0 computes — every rank must agree on
    the is-best decision, ref train_joint.py:437-454)."""
    import jax

    if jax.process_count() == 1:
        return value
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.asarray(
        [value if value is not None else np.nan], np.float64
    )
    out = float(multihost_utils.broadcast_one_to_all(arr)[0])
    return None if np.isnan(out) else out


def replicate_to_host(tree, mesh):
    """Materialize a (possibly cross-process) sharded pytree as full host
    numpy arrays on every process — used for the rank-0 val loop, whose
    single-device jits cannot consume arrays sharded across remote hosts.
    All processes must call this together (it is one SPMD all-gather)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    out_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    rep = jax.jit(lambda t: t, out_shardings=out_sh)(tree)
    return jax.tree.map(lambda a: np.asarray(a.addressable_data(0)), rep)


def host_local_slice(sharding, global_shape):
    """Index tuple covering this process's addressable shards of a global
    array (contiguous for the process-major meshes `make_mesh` builds)."""
    lo = [None] * len(global_shape)
    hi = [None] * len(global_shape)
    for idx in sharding.addressable_devices_indices_map(
        tuple(global_shape)
    ).values():
        for a, sl in enumerate(idx):
            start = 0 if sl.start is None else sl.start
            stop = global_shape[a] if sl.stop is None else sl.stop
            lo[a] = start if lo[a] is None else min(lo[a], start)
            hi[a] = stop if hi[a] is None else max(hi[a], stop)
    return tuple(slice(l, h) for l, h in zip(lo, hi))


def put_global(mesh, spec, full_host_array):
    """Global sharded jax.Array from a host batch every process holds.

    Single-process: plain device_put. Multi-process: each host feeds only
    its local slice via jax.make_array_from_process_local_data — the
    TPU-native equivalent of the reference's per-rank DataLoader batches
    entering the NCCL data-parallel group.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    x = np.asarray(full_host_array)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    local = x[host_local_slice(sharding, x.shape)]
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), x.shape
    )
