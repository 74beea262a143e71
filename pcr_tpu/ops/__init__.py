from . import eigen3, knn, normals, outlier, voxel  # noqa: F401
