"""Visloc benchmark datasets (reference dust3r_visloc/datasets/__init__.py)."""
from .base_dataset import BaseVislocDataset  # noqa: F401
from .base_colmap import BaseVislocColmapDataset  # noqa: F401
from .cambridge_landmarks import VislocCambridgeLandmarks  # noqa: F401
from .aachen_day_night import VislocAachenDayNight  # noqa: F401
from .sevenscenes import VislocSevenScenes  # noqa: F401
from .inloc import VislocInLoc  # noqa: F401
