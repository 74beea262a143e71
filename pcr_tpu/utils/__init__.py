from . import cloud, pcd, poses_io, quaternion, se3  # noqa: F401
