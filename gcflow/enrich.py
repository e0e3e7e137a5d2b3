"""Actor-pool enrichment stage (SURVEY.md E6).

Mirrors the reference's event-type classification as dictionary lookup:
role/tool dictionaries are loaded once per actor in ``__init__`` (the
actor-pool pattern — never per batch), lookups are vectorized via
``pc.index_in`` + ``take`` on zero-copy Arrow batches.

For larger dictionaries the same class accepts a ``ray.ObjectRef``
(broadcast once with ``ray.put`` on the driver, fetched once per actor) —
the broadcast-small-side pattern instead of a shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# default dictionaries (deterministic; mirrored in the SQL oracles)
ROLE_CLASSES = {"user": "human", "assistant": "model", "tool": "system"}
TOOL_CLASSES = {"jvm": "runtime", "gc": "runtime", "": "none", "monitor": "observer"}
DEFAULT_CLASS = "other"


def _lookup(col: pa.ChunkedArray, mapping: dict) -> pa.Array:
    keys = pa.array(list(mapping.keys()), type=pa.string())
    vals = pa.array(list(mapping.values()) + [DEFAULT_CLASS], type=pa.string())
    idx = pc.index_in(col, value_set=keys)  # null where missing
    idx = pc.fill_null(idx, len(mapping))
    return pc.take(vals, idx)


class EnrichStage:
    """Callable class → Ray schedules an actor pool; state built once."""

    def __init__(self, role_classes_ref=None, tool_classes_ref=None):
        import ray

        self.role_classes = (
            ray.get(role_classes_ref) if role_classes_ref is not None else ROLE_CLASSES
        )
        self.tool_classes = (
            ray.get(tool_classes_ref) if tool_classes_ref is not None else TOOL_CLASSES
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "role_class", _lookup(batch["role"], self.role_classes)
        )
        return batch.append_column(
            "tool_class", _lookup(batch["tool"], self.tool_classes)
        )
