"""Driver contract for the prclz_ray engine.

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ray.init()/ray.shutdown().

  entry()      flagship pipeline (pages-style corpus derived from the
               sf0.001 documents table → parse → dedup → S2 tiles → PIP
               join vs synthetic regions) — returns the joined Dataset's
               per-region counts.
  queries()    one callable per implemented operator/pipeline (SURVEY §2 +
               the training-data operator suite); each takes sf_dir.
  oracle_sql() matching DuckDB SQL per query where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from prclz_ray.pipelines.queries import q_flagship_region_counts
    return q_flagship_region_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from prclz_ray.pipelines.queries import registry
    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from prclz_ray.pipelines.queries import registry
    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
