#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run each
__ray_entry__ query AND its DuckDB oracle at sf0.01, compare row count,
schema (column names) and order-insensitive values (columns sorted by
name, rows sorted)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
# geo oracle SQL reads the synthesized pages corpus for THIS sf
os.environ["GEORAY_ORACLE_SF_DIR"] = SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qmap = m.queries()
    omap = m.oracle_sql()
    failures = []
    for name in sorted(qmap):
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(qmap[name](SF_DIR)))
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[:200]}")
            continue
        wall = time.perf_counter() - t0
        if name not in omap:
            print(f"ok   {name}: rows={len(got)} (rows-only, {wall:.1f}s)")
            continue
        try:
            want = canon(con.execute(omap[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {str(e)[:200]}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        try:
            import pandas.testing as pdt

            want2 = want.astype(got.dtypes.to_dict(), errors="ignore")
            pdt.assert_frame_equal(got, want2, check_dtype=False, check_exact=True)
            # the driver's hash compare is dtype-sensitive (r01: int64 vs
            # DuckDB HUGEINT->float64 flipped 4 queries amber) — surface
            # any dtype drift loudly even though values match
            drift = {
                c: (str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if str(got[c].dtype) != str(want[c].dtype)
            }
            tag = f" DTYPE-DRIFT {drift}" if drift else ""
            print(f"ok   {name}: rows={len(got)} hash-equal ({wall:.1f}s){tag}")
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL {name}: values differ: {str(e)[:300]}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries verified")


if __name__ == "__main__":
    main()
