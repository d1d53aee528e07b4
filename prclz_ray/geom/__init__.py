from . import core, predicates, strtree, voronoi, wkb  # noqa: F401
