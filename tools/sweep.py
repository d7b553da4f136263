"""Driver-style correctness sweep: run __ray_entry__.queries() against
oracle_sql() DuckDB results over an sf dir (default sf0.01), mirroring the
driver's compare (sort columns by name, sort rows, rtol=1e-4 on floats).

Usage (from /root/repo):
    python tools/sweep.py [query ...]        # all queries if none given
    SWEEP_SF=/root/testdata/sf0.001 python tools/sweep.py kg_entities
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _as_df(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    import pyarrow as pa
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]") \
                .astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> dict:
    out = {"rows_match": len(ray_df) == len(ora_df),
           "schema_match": sorted(ray_df.columns) == sorted(ora_df.columns),
           "hash_match": False}
    if not (out["rows_match"] and out["schema_match"]):
        return out
    a, b = _normalize(ray_df), _normalize(ora_df)
    ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or \
                np.issubdtype(bv.dtype, np.floating):
            ok &= bool(np.allclose(av.astype(float), bv.astype(float),
                                   rtol=1e-4, equal_nan=True))
        else:
            ok &= bool((av.astype(str).values == bv.astype(str).values).all())
        if not ok:
            out["first_mismatch_col"] = c
            break
    out["hash_match"] = ok
    return out


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF", "/root/testdata/sf0.01")
    sys.path.insert(0, os.getcwd())
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("SWEEP_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__
    qs = __ray_entry__.queries()
    oracles = __ray_entry__.oracle_sql()
    wanted = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")

    results, n_bad = {}, 0
    for name in wanted:
        t0 = time.perf_counter()
        try:
            ray_df = _as_df(qs[name](sf_dir))
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            n_bad += 1
            print(f"{name:28s} ERR {results[name]['err'][:120]}")
            continue
        el = time.perf_counter() - t0
        if name not in oracles:
            results[name] = {"rows": len(ray_df), "err": "no_oracle"}
            print(f"{name:28s} rows-only {len(ray_df):>8} rows {el:6.1f}s")
            continue
        try:
            ora_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle {type(e).__name__}: {e}"}
            n_bad += 1
            print(f"{name:28s} ORACLE-ERR {str(e)[:120]}")
            continue
        r = compare(ray_df, ora_df)
        r["rows"] = len(ray_df)
        results[name] = r
        status = "OK" if r["hash_match"] else "MISMATCH"
        if not r["hash_match"]:
            n_bad += 1
        print(f"{name:28s} {status:9s} {len(ray_df):>8} vs {len(ora_df):<8}"
              f" {el:6.1f}s"
              + (f"  col={r.get('first_mismatch_col')}"
                 if r.get("first_mismatch_col") else ""))
    ray.shutdown()
    with open("/tmp/sweep_results.json", "w") as fh:
        json.dump(results, fh, indent=1, default=str)
    print(f"\n{len(wanted) - n_bad}/{len(wanted)} clean; "
          f"details /tmp/sweep_results.json")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
