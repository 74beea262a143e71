from . import evaluate, gicp, multiscale  # noqa: F401
