"""dust3r_tpu: a TPU-native (JAX/XLA/Pallas) geometric 3D vision framework.

Capability-parity rebuild of naver/dust3r: two-view pointmap regression,
pairwise scene-graph inference, global alignment, training, visual
localization - redesigned for TPU (static-shape AR buckets, pjit/Mesh data
parallelism, Pallas fused attention with 2D RoPE, lax.scan'd aligner).
"""

__version__ = "0.1.0"

from .models.model import AsymmetricCroCo3DStereo, NAMED_MODELS  # noqa: F401
