"""Log hygiene for long-running executions.

Ray Data's shuffle emits a WARNING per empty output partition ("Operator
produced a RefBundle with a different schema than the previous one ...
new schema: .") whenever a groupby/sort produces fewer groups than
partitions — the empty block is built inside the AllToAll operator with
no schema, BEFORE any user code runs, so no declared output schema can
prevent it (verified empirically: the map_groups UDF is never called for
those partitions).  The blocks are correct; the message is noise — and at
10⁴ tasks it floods the log and buries real warnings.  This module
installs a targeted ``logging.Filter`` dropping exactly that message (and
only when the new schema is EMPTY — a genuine mid-stream schema change
still warns)."""
from __future__ import annotations

import logging

_MARK = "RefBundle with a different schema"


class _EmptySchemaChatter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if _MARK not in msg:
            return True
        # keep real schema-change warnings; drop only the empty-block
        # forms (no schema at all, or a zero-column pandas block)
        return ("new schema: ." not in msg
                and "new schema: PandasBlockSchema(names=[]" not in msg)


def install() -> None:
    """Idempotent: attach the filter to the ray.data logger tree."""
    for name in ("ray.data", "ray.data._internal.execution"
                 ".streaming_executor_state"):
        lg = logging.getLogger(name)
        if not any(isinstance(f, _EmptySchemaChatter) for f in lg.filters):
            lg.addFilter(_EmptySchemaChatter())
