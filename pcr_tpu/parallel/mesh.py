"""Device mesh & sharding helpers (SURVEY §2.4 — the layer the reference lacks).

The registration workload has two natural parallel axes:
  * ``pairs`` — scan pairs are embarrassingly parallel (the reference's serial
    Python loop over 901 pairs, ``1_...py:134-147``); data-parallel over chips.
  * ``points`` — within-pair sharding of large clouds for the k-NN tiles
    (Courtyard 240k points), used by the sharded neighbor kernels.

Multi-host initialization goes through ``jax.distributed.initialize`` before
mesh creation; on a single process the same code paths run over the local
devices (or a virtual CPU mesh under xla_force_host_platform_device_count).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pair_mesh(n_devices: int | None = None, axis: str = "pairs") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def make_2d_mesh(n_pairs: int, n_points: int) -> Mesh:
    """(pairs, points) mesh for pair-parallel + within-pair point sharding."""
    return jax.make_mesh((n_pairs, n_points), ("pairs", "points"))


def pair_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("pairs"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
