from . import mesh, pair_sharding, distributed_pg  # noqa: F401
