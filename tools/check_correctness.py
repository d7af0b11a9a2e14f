"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB (row count + order-insensitive value comparison, columns sorted
by name).  Usage: python tools/check_correctness.py [names...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            res = res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    sys.path.insert(0, "/root/repo")

    from automatic_reference_extractor_ray.logquiet import (
        install_benign_log_filters)
    install_benign_log_filters()
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    only = set(sys.argv[1:])
    ok = bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_df(fn(SF)))
        except Exception as e:
            print(f"[FAIL-RUN ] {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(mine)} rows")
            ok += 1
            continue
        try:
            oracle = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"[FAIL-SQL ] {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if len(mine) != len(oracle):
            print(f"[MISMATCH ] {name}: rows {len(mine)} vs {len(oracle)}")
            bad += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"[MISMATCH ] {name}: cols {list(mine.columns)} vs {list(oracle.columns)}")
            bad += 1
            continue
        eq = True
        for c in mine.columns:
            if not (mine[c].to_numpy() == oracle[c].to_numpy()).all():
                diffs = (mine[c].to_numpy() != oracle[c].to_numpy()).sum()
                print(f"[MISMATCH ] {name}: column {c} differs in {diffs} rows")
                print("  mine:  ", mine[mine[c].to_numpy() != oracle[c].to_numpy()].head(3).to_dict("records"))
                print("  oracle:", oracle[mine[c].to_numpy() != oracle[c].to_numpy()].head(3).to_dict("records"))
                eq = False
                break
        if eq:
            print(f"[OK       ] {name}: {len(mine)} rows")
            ok += 1
        else:
            bad += 1
    print(f"\n{ok} ok, {bad} bad")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
