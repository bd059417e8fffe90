"""Visloc benchmark datasets (reference dust3r_visloc/datasets/__init__.py).

Exports the four benchmark dataset classes plus the two bases through a
name registry so CLI drivers can resolve ``--dataset`` strings directly.
"""
from . import aachen_day_night as _aachen
from . import base_colmap as _base_colmap
from . import base_dataset as _base
from . import cambridge_landmarks as _cambridge
from . import inloc as _inloc
from . import sevenscenes as _sevenscenes

BaseVislocDataset = _base.BaseVislocDataset
BaseVislocColmapDataset = _base_colmap.BaseVislocColmapDataset

#: name -> class registry used by the eval-DSL namespace in visloc.py
DATASET_REGISTRY = {
    cls.__name__: cls
    for cls in (
        _sevenscenes.VislocSevenScenes,
        _cambridge.VislocCambridgeLandmarks,
        _aachen.VislocAachenDayNight,
        _inloc.VislocInLoc,
    )
}
globals().update(DATASET_REGISTRY)

__all__ = ["BaseVislocDataset", "BaseVislocColmapDataset",
           "DATASET_REGISTRY", *DATASET_REGISTRY]
