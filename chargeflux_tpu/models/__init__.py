from .water import (
    water_box,
    water_cluster,
    WATER_MASSES,
)

__all__ = ["water_box", "water_cluster", "WATER_MASSES"]
