"""Self-check mirroring the driver's correctness gate: run every
registry query in Spark AND its DuckDB oracle on the same parquet
tables, compare row counts + column names + order-insensitive values.

Usage: PYTHONPATH=. python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(kind: str) -> str:
    """Collapse a numpy dtype kind into the classes the driver's hash
    distinguishes: integer, float, bool, datetime, everything-else."""
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in "mM":
        return "time"
    return "obj"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    # DTYPE-STRICT (r05 lesson): the driver hashes dtype-sensitively,
    # so an int64 Spark column vs a float64 oracle column (DuckDB
    # HUGEINT -> float64 via .df()) hash-differs even when every value
    # is equal.  Value-only comparison shipped 5 driver-red gates in
    # r05 under a local "parity OK".  Fail on any dtype-CLASS mismatch.
    # (Symmetric float64-vs-float64 from nullable ints is fine — both
    # Spark's toPandas and DuckDB's .df() widen nullable ints the same
    # way, so the driver sees matching dtypes there.)
    for c in a.columns:
        ka, kb = _dtype_class(a[c].dtype.kind), _dtype_class(b[c].dtype.kind)
        if ka != kb:
            problems.append(
                f"col {c}: dtype class differs: spark={a[c].dtype} ({ka}) "
                f"oracle={b[c].dtype} ({kb}) — driver hash WILL mismatch "
                f"even if values are equal"
            )
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = pd.to_numeric(av, errors="coerce")
                bv = pd.to_numeric(bv, errors="coerce")
                # EXACT: the driver hashes values bit-for-bit, so a local
                # pass must mean a driver pass — no epsilon (a 1e-12
                # relative tolerance hid the AVG-over-doubles
                # nondeterminism the driver caught in r01/r03)
                bad = ~((av.isna() & bv.isna()) | (av == bv))
            else:
                bad = av.astype(str) != bv.astype(str)
            n_bad = int(bad.sum())
            if n_bad:
                i = bad.idxmax()
                problems.append(
                    f"col {c}: {n_bad} mismatches, first at row {i}: "
                    f"spark={a[c][i]!r} oracle={b[c][i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pipit_spark.session import get_spark
    from pipit_spark import queries as Q

    spark = get_spark(app_name="parity", shuffle_partitions=8)
    qs, osql = Q.queries(), Q.oracle_sql()
    ok = bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in osql:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            ok += 1
            continue
        try:
            odf = run_oracle(osql[name], sf_dir)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            bad += 1
        else:
            print(f"OK   {name}: {len(sdf)} rows")
            ok += 1
    print(f"\n{ok} ok, {bad} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
