"""morefusion_tpu — TPU-native multi-object 6D pose estimation & volumetric fusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of MoreFusion
(CVPR 2020): differentiable 3D geometry ops, volumetric pose prediction,
occupancy-aware refinement, multi-instance occupancy mapping, and YCB-Video
dataset pipelines.

Conventions (TPU-native, intentionally different from the Chainer reference):
  - Voxel grids are channels-last ``(B, X, Y, Z, C)`` (reference: ``BCXYZ``)
    so the channel dimension maps onto TPU vector lanes.
  - All differentiable ops are pure ``jax.numpy`` functions or Pallas kernels;
    gradients come from JAX autodiff (custom VJPs only where semantics differ).
  - Batched code paths use ``vmap``/fixed shapes instead of per-sample loops.
"""

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out: MFTPU_NO_COMPILE_CACHE).

    The remote-TPU relay compiles the full train step in ~530 s; a
    4-variant training campaign would pay that per process. The disk
    cache brings repeat compiles down to seconds. Safe to set any time
    before the first compile; no-op if jax is absent.
    """
    if _os.environ.get("MFTPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # CPU-only runs (unit tests, multi-process workers) must NOT
        # share the cache: XLA:CPU AOT artifacts bake in machine-feature
        # flags (+prefer-no-gather etc.) that are not part of the cache
        # key, and loading one compiled under different flags corrupts
        # execution. CPU compiles are fast; the cache matters for the
        # ~500 s remote-TPU relay compiles.
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = _os.environ.get(
                "MFTPU_COMPILE_CACHE_DIR",
                _os.path.expanduser("~/.cache/mftpu_xla"),
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:
        pass  # never let cache setup break imports


_enable_compilation_cache()

from . import functions  # noqa: F401
from . import geometry  # noqa: F401
from . import metrics  # noqa: F401
from . import ops  # noqa: F401
from . import utils  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for heavier subpackages so `import morefusion_tpu` stays fast.
    import importlib

    if name in (
        "models",
        "datasets",
        "training",
        "parallel",
        "contrib",
        "simulation",
        "extra",
        "runtime",
    ):
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
