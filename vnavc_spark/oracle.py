"""Self-serve correctness gate: run a registry query and its DuckDB
oracle on the same parquet tables, compare row count, column names,
and an order-insensitive value hash — the same check the external
driver applies. CLI: ``python -m vnavc_spark verify <query|all>``.
DuckDB is an optional dependency here: import errors surface at call
time, not import time, so the engine itself never requires it.
"""

from __future__ import annotations

import hashlib
import math

from vnavc_spark.io import TESTDATA_TABLES


def duckdb_connect(sf_dir: str):
    import os

    import duckdb  # optional dependency — only the verify path needs it

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships flat files; Spark-written tables are
        # DIRECTORIES of part files — glob those for DuckDB
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — mismatches surface
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    """Order-insensitive: sort columns by name, then sort row strings."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def assert_canonicalizable(sdf, name: str = "query") -> None:
    """Registered queries must emit only scalar columns: the external
    driver canonicalizes results with pandas sort_values/factorize,
    which crashes on list/dict cells (array, map, struct types) —
    q82's array<bigint> postings column was round 3's one red row.
    Render arrays with ``array_join``/``array_to_string`` instead."""
    from pyspark.sql import types as T

    for f in sdf.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            raise AssertionError(
                f"{name}: column '{f.name}' has complex type "
                f"{f.dataType.simpleString()} — the driver canonicalizer "
                "cannot hash it; flatten to a scalar (e.g. array_join)"
            )


def compare(spark, con, fn, sql: str, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    assert_canonicalizable(sdf)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [c.lower() for c in [d[0] for d in res.description]]
    d_rows = res.fetchall()
    out = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
        "hash_spark": value_hash(s_rows, s_cols),
        "hash_duck": value_hash(d_rows, d_cols),
    }
    out["rows_match"] = out["rows_spark"] == out["rows_duck"]
    out["cols_match"] = out["cols_spark"] == out["cols_duck"]
    out["hash_match"] = out["hash_spark"] == out["hash_duck"]
    out["ok"] = out["rows_match"] and out["cols_match"] and out["hash_match"]
    return out
