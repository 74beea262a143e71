"""pcr_tpu — TPU-native point-cloud registration with global refinement.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
repo ``Point-Cloud-Registration-with-Global-Refinement`` (FPFH+FGR coarse
registration, multi-scale GICP refinement, and SLERP/LUM/SLERP+LUM/pose-graph
global refinement), re-designed TPU-first: fixed-shape masked arrays, batched
pairs over a device mesh, matmul-based neighbor search, and collective-reduced
pose-graph solves.

Importable alias: ``point_cloud_registration_with_global_refinement_tpu``.
"""

import os as _os

# Persistent XLA compile cache: the big fixed-shape kernels (245k-point FPFH /
# kNN at Courtyard scale) take minutes to compile on first use; cache them
# across CLI/pipeline invocations.  Lives inside the repo tree (gitignored)
# rather than /tmp so it survives environment resets between sessions.
# Respect the caller's setting if present.  NOTE: this JAX build does NOT read
# JAX_COMPILATION_CACHE_DIR from the environment (config stays None even when
# the var is exported before import) — the cache must be enabled through
# jax.config.update below.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                  ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(_os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))

# Geometry workloads need true-f32 matmuls: the default TPU policy lowers f32
# dot products to single-pass bf16, which is catastrophic for squared-distance
# ranking (errors ~|q||r|*2^-8 vs neighbor gaps of millimeters).  'highest'
# selects the multi-pass f32 MXU path; kernels that can tolerate less override
# locally.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import utils  # noqa: F401,E402

__version__ = "0.1.0"
