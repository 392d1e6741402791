"""Device mesh and sharding helpers.

The reference scales with NCCL collectives (FSDP + Ulysses all-to-all +
context-parallel chunking, models/wan/distributed/). Here all of that maps
onto a single named `jax.sharding.Mesh`:

  dp    data parallel        (DistributedIterableDataset rank sharding)
  fsdp  parameter sharding   (ZeRO-3 / shard_model, fsdp.py:23-35)
  sp    sequence parallel    (Ulysses + context chunking, ulysses.py:9-47)
  tp    tensor parallel      (absent in reference; free via GSPMD)

Collectives ride ICI; barriers are implicit in SPMD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_SP = "sp"
AXIS_TP = "tp"

ALL_AXES = (AXIS_DP, AXIS_FSDP, AXIS_SP, AXIS_TP)


@dataclass(frozen=True)
class MeshSpec:
    dp: int = 1
    fsdp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.fsdp * self.sp * self.tp

    def axis_sizes(self) -> Tuple[int, int, int, int]:
        return (self.dp, self.fsdp, self.sp, self.tp)


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a named mesh. Defaults to all devices on the fsdp axis."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(fsdp=len(devices))
    if spec.size != len(devices):
        raise ValueError(
            f"mesh spec {spec} needs {spec.size} devices, have {len(devices)}")
    arr = np.asarray(devices).reshape(spec.axis_sizes())
    return Mesh(arr, ALL_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(), devices=jax.devices()[:1])


def shard(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding helper: shard(mesh, 'dp', None, 'tp')."""
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
