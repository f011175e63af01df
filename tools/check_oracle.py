"""Local mirror of the driver's correctness gate: run every registered
query on Spark at sf0.01 AND its DuckDB oracle, compare row count, schema
(column names), and order-insensitive values (columns sorted by name,
values stringified).

Values are fetched THROUGH PANDAS on both sides (Spark ``toPandas``,
DuckDB ``.df()``) because that is where round-1's hash failures came from:
DuckDB decimals become float64 in pandas (``Decimal('20706.60')`` →
``20706.6``) while Spark keeps ``Decimal`` objects with fixed scale, so a
fetchall()-based compare passes while the driver's pandas-based hash
fails. Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from go_bqloader_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from go_bqloader_spark.plans.queries import TABLES  # noqa: E402
from go_bqloader_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, bytes):
        return v.hex()
    try:  # pandas NaT / NA
        import pandas as pd

        if v is pd.NaT or (hasattr(pd, "NA") and v is pd.NA):
            return "NULL"
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def pdf_rows(pdf):
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def main(names):
    spark = build_session(master="local[8]", shuffle_partitions=8,
                          extra_conf={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    failures = 0
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = pdf_rows(spdf)
            sql = ORACLE_SQL.get(name)
            if sql is None:
                print(f"{name:24s} rows={len(srows)} (no oracle — rows-only)")
                continue
            dpdf = con.execute(sql).df()
            dcols = list(dpdf.columns)
            drows = pdf_rows(dpdf)
            ok_schema = sorted(scols) == sorted(dcols)
            ok_count = len(srows) == len(drows)
            ok_vals = ok_schema and rowset(scols, srows) == rowset(dcols, drows)
            status = "OK " if (ok_schema and ok_count and ok_vals) else "FAIL"
            print(f"{name:24s} {status} rows={len(srows)}/{len(drows)} "
                  f"schema={'=' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
                  f"values={'=' if ok_vals else 'DIFF'}")
            if status == "FAIL":
                failures += 1
                if ok_schema and ok_count and not ok_vals:
                    a, b = rowset(scols, srows), rowset(dcols, drows)
                    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    for x, y in diffs:
                        print(f"    spark: {x}\n    duck : {y}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
