"""Import-parity shim: `from dust3r_tpu.model import ...` mirrors the
reference's `from dust3r.model import ...` surface."""
from .models.model import (AsymmetricCroCo3DStereo, NAMED_MODELS,  # noqa
                           dust3r_224_linear, dust3r_512_linear,
                           dust3r_512_dpt)
from .checkpoint import (from_pretrained, load_torch_checkpoint,  # noqa
                         model_from_arch_string)


def load_model(model_path, device=None, verbose=True):
    """Reference-compatible loader (dust3r/model.py:27-43): returns
    (model definition, variables). `device` accepted and ignored."""
    return load_torch_checkpoint(model_path, verbose=verbose)
