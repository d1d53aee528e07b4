"""HTML → text extraction as a stateful actor-pool ``map_batches`` stage.

North-rule stage T5 (SURVEY §2.3): per-row text extracted byte-identically
per url inside a stateful actor pool over zero-copy Arrow. The extractor is
a pure function of the ``html`` bytes — no batch-context dependence — so
output is byte-identical at any parallelism (BASELINE.json input_hint
invariant). Regexes are compiled once per actor in ``__init__``.

Reference analogue: the ogr2ogr predicate-filtered OSM layer extraction
(``etl/_extract.py:5-18``, ``scripts/extract.sh:21-23``) re-expressed as a
batch parse/extract stage over the page payload column.
"""
from __future__ import annotations

import re

import pyarrow as pa

_SCRIPT = re.compile(rb"<(script|style)\b.*?</\1>", re.S | re.I)
_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(rb"\s+")
_ENTITIES = [
    (b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
    (b"&#39;", b"'"), (b"&amp;", b"&"),
]


def extract_text_bytes(html: bytes) -> str:
    """Pure html→text: drop script/style, strip tags, decode the five basic
    entities, collapse whitespace. Deterministic byte-for-byte. All passes
    are C-level constant substitutions (measured faster than a fused
    callable-replacement regex despite the extra copies)."""
    s = _SCRIPT.sub(b" ", html)
    s = _TAG.sub(b" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS.sub(b" ", s).strip()
    return s.decode("utf-8", errors="replace")


class TextExtractor:
    """Actor-pool stage: ``ds.map_batches(TextExtractor, batch_format="pyarrow",
    concurrency=N, zero_copy_batch=True)``. Emits ``text_extracted``.

    State (compiled regexes) is built once per actor; ``__call__`` is a pure
    per-batch function."""

    def __init__(self, drop_html: bool = True):
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pa.array([extract_text_bytes(h)
                          for h in batch["html"].to_pylist()],
                         type=pa.string())
        out = batch.append_column("text_extracted", texts)
        if self.drop_html:
            # html is the widest column (SURVEY §7.5.6): project it away the
            # moment it has been consumed so it never enters a shuffle
            out = out.drop_columns(["html"])
        return out
