from .water import (
    water_bonded_params,
    water_box,
    water_cluster,
    WATER_MASSES,
)

__all__ = ["water_bonded_params", "water_box", "water_cluster", "WATER_MASSES"]
