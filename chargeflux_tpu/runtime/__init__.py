from .native import (
    cell_histogram,
    native_available,
    native_direct_energy,
    native_flux_charges,
)

__all__ = ["native_available", "cell_histogram", "native_flux_charges",
           "native_direct_energy"]
