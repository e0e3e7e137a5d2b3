"""Driver-style side-by-side parity check: queries() vs oracle_sql().

Runs every entry in __ray_entry__.queries() at a given sf dir, runs the
matching oracle SQL through DuckDB over the same parquet tables, and
compares rows / schema / value-hash the way the driver does (columns
sorted by name, rows sorted by all columns, values stringified and
hashed).  Prints one JSON object keyed by query name.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        vals = df[col]
        if pd.api.types.is_float_dtype(vals):
            s = vals.map(lambda v: "null" if pd.isna(v) else f"{v:.6g}")
        else:
            s = vals.map(lambda v: "null" if pd.isna(v) else str(v))
        h.update(("\x00".join(s.tolist()) + "\x01" + col).encode())
    return h.hexdigest()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    queries = getattr(entry, "queries_full", entry.queries)()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    out = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            mine = _norm(_to_pandas(fn(sf_dir)))
            rec["spark_rows"] = len(mine)
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
            else:
                theirs = _norm(con.execute(sql).fetchdf())
                rec["oracle_rows"] = len(theirs)
                rec["rows_match"] = len(mine) == len(theirs)
                rec["schema_match"] = list(mine.columns) == list(theirs.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    for c in theirs.columns:
                        try:
                            mine[c] = mine[c].astype(theirs[c].dtype)
                        except (TypeError, ValueError):
                            pass
                    mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
                    theirs = theirs.sort_values(list(theirs.columns)).reset_index(drop=True)
                    rec["hash_match"] = _hash(mine) == _hash(theirs)
                else:
                    rec["hash_match"] = False
        except Exception as exc:  # noqa: BLE001 - report, don't die
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        flag = ("OK " if rec["hash_match"]
                else ("----" if rec["err"] == "no_oracle" else "FAIL"))
        print(f"{flag} {name}: rows={rec['spark_rows']} "
              f"oracle={rec['oracle_rows']} err={rec['err']}", file=sys.stderr)

    print(json.dumps(out, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
