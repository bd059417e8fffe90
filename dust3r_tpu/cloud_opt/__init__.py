"""Global alignment: fuse pairwise pointmaps into one consistent scene.

Behavioral contract: /root/reference/dust3r/cloud_opt/__init__.py:14-33.
"""
from enum import Enum

from .optimizer import PointCloudOptimizer, ModularPointCloudOptimizer
from .pair_viewer import PairViewer


class GlobalAlignerMode(Enum):
    PointCloudOptimizer = "PointCloudOptimizer"
    ModularPointCloudOptimizer = "ModularPointCloudOptimizer"
    PairViewer = "PairViewer"


_MODES = {
    GlobalAlignerMode.PointCloudOptimizer: PointCloudOptimizer,
    GlobalAlignerMode.ModularPointCloudOptimizer: ModularPointCloudOptimizer,
    GlobalAlignerMode.PairViewer: PairViewer,
}


def global_aligner(dust3r_output, device=None,
                   mode=GlobalAlignerMode.PointCloudOptimizer, **optim_kw):
    """Build a scene optimizer from the inference output dict.

    `device` is accepted for API compatibility and ignored (JAX manages
    placement; the optimization runs on the default backend).
    """
    view1, view2 = dust3r_output["view1"], dust3r_output["view2"]
    pred1, pred2 = dust3r_output["pred1"], dust3r_output["pred2"]
    try:
        cls = _MODES[mode]
    except KeyError:
        raise NotImplementedError(f"Unknown mode {mode}")
    return cls(view1, view2, pred1, pred2, **optim_kw)
