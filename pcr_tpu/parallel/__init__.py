"""Mesh/sharding layer (SURVEY §2.4).  Submodules load lazily (PEP 562):
multihost bring-up must call ``mesh.maybe_initialize_distributed`` —
``jax.distributed.initialize`` — BEFORE anything touches the XLA backend,
and the compute submodules (pair_sharding -> models -> ops) create jnp
constants at import time, which would initialize it."""

import importlib

_SUBMODULES = ("mesh", "pair_sharding", "point_sharding", "distributed_pg")


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
