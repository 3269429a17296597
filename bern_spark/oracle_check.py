"""Local oracle harness: run each entry query on Spark AND its DuckDB
oracle SQL, compare row count + order-insensitive values (columns sorted
by name) — a faithful stand-in for the driver's CORRECTNESS check so
mismatches surface before a round ends.
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    ok_cols = sc == dc
    ok_count = len(sr) == len(dr)
    ok_vals = sr == dr
    detail = ""
    if not ok_cols:
        detail = f"cols spark={sc} duck={dc}"
    elif not ok_count:
        detail = f"rows spark={len(sr)} duck={len(dr)}"
    elif not ok_vals:
        for a, b in zip(sr, dr):
            if a != b:
                detail = f"first diff: spark={a} duck={b}"
                break
    return {
        "name": name,
        "ok": ok_cols and ok_count and ok_vals,
        "rows": len(sr),
        "detail": detail,
    }


def run_all(spark, sf_dir: str, names=None) -> list[dict]:
    from bern_spark.entry_queries import ORACLES, QUERIES

    out = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name not in ORACLES:
            # rows-only contract (driver checks rows>=0 itself)
            try:
                n = fn(spark, sf_dir).count()
                out.append({"name": name, "ok": n >= 0, "rows": n, "detail": "rows-only"})
            except Exception as e:  # pragma: no cover
                out.append({"name": name, "ok": False, "rows": -1, "detail": f"{type(e).__name__}: {e}"})
            continue
        try:
            out.append(compare(spark, sf_dir, name, fn, ORACLES[name]))
        except Exception as e:  # pragma: no cover
            out.append({"name": name, "ok": False, "rows": -1, "detail": f"{type(e).__name__}: {e}"})
    return out
