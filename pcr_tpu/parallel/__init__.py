from . import mesh, pair_sharding, point_sharding, distributed_pg  # noqa: F401
