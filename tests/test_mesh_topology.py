"""DCN-aware mesh construction (multi-slice pods).

The reference's 2-node NCCL layout puts data parallelism across nodes
(ref train_joint.py:132-134, run_torchrun.sh:6-23); the TPU equivalent is
data across DCN slices with fsdp/tensor inside each slice's ICI
(SURVEY.md §2.9). Validated with fake multi-slice devices — real
multi-slice hardware isn't reachable here.
"""
import dataclasses

import numpy as np
import pytest

from rga3_tpu.config import MeshConfig
from rga3_tpu.parallel.mesh import make_mesh, mesh_device_array


@dataclasses.dataclass(frozen=True)
class FakeDevice:
    id: int
    process_index: int
    slice_index: int
    platform: str = "cpu"
    device_kind: str = "cpu"

    def __repr__(self):
        return f"d{self.id}(slice{self.slice_index})"


def _pod(n_slices: int, per_slice: int):
    return [
        FakeDevice(id=s * per_slice + i, process_index=s, slice_index=s)
        for s in range(n_slices)
        for i in range(per_slice)
    ]


def test_data_axis_crosses_slices_fsdp_stays_inside():
    devs = _pod(n_slices=2, per_slice=4)
    arr = mesh_device_array(MeshConfig(data=2, fsdp=4, tensor=1), devs)
    assert arr.shape == (2, 4, 1)
    # each data row = one slice (fsdp collectives ride ICI only)
    for d in range(2):
        slices = {dev.slice_index for dev in arr[d].flat}
        assert len(slices) == 1, f"fsdp group spans slices: {slices}"
    # the data axis crosses DCN
    assert {arr[0, 0, 0].slice_index, arr[1, 0, 0].slice_index} == {0, 1}


def test_data_axis_split_ici_and_dcn():
    # data=4 over 2 slices: 2 DCN x 2 ICI replicas
    devs = _pod(n_slices=2, per_slice=4)
    arr = mesh_device_array(MeshConfig(data=4, fsdp=2, tensor=1), devs)
    assert arr.shape == (4, 2, 1)
    for d in range(4):
        assert len({dev.slice_index for dev in arr[d].flat}) == 1


def test_fsdp_cannot_span_dcn():
    devs = _pod(n_slices=2, per_slice=4)
    with pytest.raises(ValueError, match="slice count"):
        mesh_device_array(MeshConfig(data=1, fsdp=8, tensor=1), devs)


def test_single_slice_plain_reshape():
    devs = _pod(n_slices=1, per_slice=8)
    arr = mesh_device_array(MeshConfig(data=2, fsdp=4, tensor=1), devs)
    assert arr.shape == (2, 4, 1)
    assert [d.id for d in arr.flat] == list(range(8))


def test_default_cfg_is_slice_aware():
    # make_mesh() with no cfg on a multi-slice pod must not put fsdp
    # across DCN (and must not crash on data=1 % n_slices)
    devs = _pod(n_slices=2, per_slice=4)
    mesh = make_mesh(None, devices=devs)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 4, "tensor": 1}


def test_make_mesh_on_real_cpu_devices():
    # jax CPU devices have no slice_index -> plain reshape path
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "tensor": 2}
