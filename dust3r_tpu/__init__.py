"""dust3r_tpu: a TPU-native (JAX/XLA/Pallas) geometric 3D vision framework.

Capability-parity rebuild of naver/dust3r: two-view pointmap regression,
pairwise scene-graph inference, global alignment, training, visual
localization - redesigned for TPU (static-shape AR buckets, pjit/Mesh data
parallelism, Pallas fused attention with 2D RoPE, lax.scan'd aligner).
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache, on by default.

    First compile of the 512_dpt forward costs 45-140 s on TPU; the cache
    cuts every later process's compile to seconds (measured 88 s -> 2.4 s
    through a remote-compile tunnel). Opt out with
    DUST3R_TPU_NO_COMPILE_CACHE=1; JAX_COMPILATION_CACHE_DIR still wins if
    the user set it themselves.
    """
    import os

    if os.environ.get("DUST3R_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "dust3r_tpu", "jax")
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              5.0)
    except Exception:  # pragma: no cover - never block import on this
        pass


_enable_compile_cache()

from .models.model import AsymmetricCroCo3DStereo, NAMED_MODELS  # noqa: F401,E402


def __getattr__(name):
    """Lazy top-level API (avoids import cycles / heavy deps at import)."""
    if name in ("inference", "InferenceEngine"):
        from . import inference as _inf
        return getattr(_inf, name)
    if name == "make_pairs":
        from .image_pairs import make_pairs
        return make_pairs
    if name == "load_images":
        from .utils.image import load_images
        return load_images
    if name in ("global_aligner", "GlobalAlignerMode"):
        from . import cloud_opt as _co
        return getattr(_co, name)
    if name in ("from_pretrained", "load_model"):
        from . import model as _m
        return getattr(_m, name)
    raise AttributeError(name)
