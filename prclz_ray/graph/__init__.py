from . import planar, reblock_graph  # noqa: F401
