"""dust3r_tpu: a TPU-native (JAX/XLA/Pallas) geometric 3D vision framework.

Capability-parity rebuild of naver/dust3r: two-view pointmap regression,
pairwise scene-graph inference, global alignment, training, visual
localization - redesigned for TPU (static-shape AR buckets, pjit/Mesh data
parallelism, Pallas fused attention with 2D RoPE, lax.scan'd aligner).
"""

__version__ = "0.1.0"

from .models.model import AsymmetricCroCo3DStereo, NAMED_MODELS  # noqa: F401


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
