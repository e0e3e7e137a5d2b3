"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module, then:
- ``entry()`` — smoke check (flagship pipeline on sf0.001),
- ``queries()[name](sf_dir)`` vs ``oracle_sql()[name]`` via DuckDB at
  sf=0.01 (row-count + schema + order-insensitive value-hash).

No ``ray.init`` / ``ray.shutdown`` here or anywhere downstream.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ray.data import DataContext

# list<struct> event columns must not be coerced to tensor extensions
DataContext.get_current().enable_tensor_extension_casting = False


def entry() -> Any:
    """Flagship parse→enrich→route pipeline on sf0.001 (events-derived
    transcripts corpus); returns the wide event Dataset."""
    from gcflow import pipeline as pl
    from gcflow import transcripts as tr

    path = tr.materialize_transcripts("/root/testdata/sf0.001")
    ds = pl.read_transcripts(path)
    return pl.parse_events(ds, mode="basic", enrich=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from gcflow.queries import GC_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(GC_QUERIES)
    try:
        from gcflow.ops.registry import OPS_QUERIES

        out.update(OPS_QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from gcflow.queries import GC_ORACLES

    out: dict[str, str] = {}
    out.update(GC_ORACLES)
    try:
        from gcflow.ops.registry import OPS_ORACLES

        out.update(OPS_ORACLES)
    except ImportError:
        pass
    return out
