from .erfc import erfc_fast

__all__ = ["erfc_fast"]
