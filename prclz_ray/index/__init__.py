from . import s2, tiling  # noqa: F401
