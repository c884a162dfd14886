"""Native C++ host runtime (feature pool, LCD scoring) with ctypes bindings."""

from .pool import FeaturePool, lcd_intersect  # noqa: F401
