"""URL canonicalization for web-corpus dedup.

A crawl sees the same page under many raw URLs (uppercase hosts, tracking
params, fragments, trailing slashes).  Canonicalizing BEFORE the url-exact
dedup shuffle collapses those variants onto one key, which both shrinks the
shuffle and fixes the dedup semantics (reference analogue: the per-record
normalization the ETL applies before keyed stages, prclz/etl download.py
name-normalization semantics).

Every step is a single RE2 kernel over the batch (arrow C++), no per-row
Python, and every step is expressible as the identical DuckDB
``regexp_replace`` chain — so the operator is oracle-checkable end to end.

Scale shape: pure per-batch map; composes with ``dedup_latest_by_url``'s
bucketed groupby unchanged.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SPLIT = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Canonical form of a URL column, as chained RE2 passes:

    1. lowercase scheme + host (path/query case is preserved — it is
       significant on most origins);
    2. strip the fragment;
    3. strip ``utm_*`` tracking params;
    4. re-anchor the query separator (first ``&`` → ``?`` when the ``?``
       was consumed with a leading utm param);
    5. strip a dangling trailing ``?`` / ``&``;
    6. strip trailing slashes on a non-root path.

    URLs with no ``scheme://`` prefix pass through steps 2-6 unchanged by
    step 1.  The DuckDB twin chains the same six regexes in the same
    order (RE2 on both sides)."""
    parts = pc.extract_regex(arr, pattern=_SPLIT)
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(parts, "scheme")), "://",
        pc.utf8_lower(pc.struct_field(parts, "host")),
        pc.struct_field(parts, "rest"), "")
    u = pc.if_else(pc.is_null(lowered), arr, lowered)
    u = pc.replace_substring_regex(u, pattern=r"#.*$", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"[?&]utm_[A-Za-z_]*=[^&#]*", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"^([^?]*)&", replacement=r"\1?", max_replacements=1)
    u = pc.replace_substring_regex(u, pattern=r"[?&]$", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"(://[^/?#]*/[^?#]*?)/+$", replacement=r"\1")
    return u


def canonicalize_url_batch(batch: pa.Table, url_col: str = "url",
                           out_col: str = "canonical_url") -> pa.Table:
    """map_batches adapter: append the canonical form of ``url_col``."""
    return batch.append_column(out_col, canonicalize_urls(batch[url_col]))


def canonical_url_groups(ds, url_col: str = "url", id_col: str | None = None):
    """Canonicalize then group: one row per canonical URL with the variant
    count (and the min id when ``id_col`` is given) — the standard crawl
    frequency/dedup report.  One groupby shuffle on the canonical key."""
    from ray.data.aggregate import Count, Min
    canon = ds.map_batches(canonicalize_url_batch, batch_format="pyarrow",
                           fn_kwargs={"url_col": url_col})
    aggs = [Count(alias_name="n_variants")]
    if id_col is not None:
        aggs.append(Min(id_col, alias_name=f"min_{id_col}"))
    return canon.groupby("canonical_url").aggregate(*aggs)
