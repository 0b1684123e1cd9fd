"""Dev harness: run every REGISTRY query AND its DuckDB oracle at a
given sf_dir, compare row count + schema + order-insensitive value
hash (mimics the driver's CORRECTNESS check). Usage:

    python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # canonical dtypes for hashing
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            got = normalize(to_pandas(fn(sf_dir)))
            if sql is None:
                print(f"{name:18s} rows={len(got)} (no oracle)")
                continue
            want = normalize(con.sql(sql).df())
            ok_rows = len(got) == len(want)
            ok_cols = list(got.columns) == list(want.columns)
            hg, hw = value_hash(got), value_hash(want)
            ok = ok_rows and ok_cols and hg == hw
            mark = "OK " if ok else "FAIL"
            print(
                f"{mark} {name:18s} rows {len(got)}/{len(want)} "
                f"cols={'=' if ok_cols else got.columns.tolist()} "
                f"hash {'=' if hg == hw else f'{hg}!={hw}'}"
            )
            if not ok:
                failures += 1
                if not ok_cols:
                    print("   ray cols:", got.columns.tolist())
                    print("   sql cols:", want.columns.tolist())
                elif hg != hw:
                    merged = got.compare(want) if len(got) == len(want) else None
                    print("   ray head:\n", got.head(3))
                    print("   sql head:\n", want.head(3))
                    if merged is not None and len(merged):
                        print("   first diffs:\n", merged.head(5))
        except Exception as e:  # noqa: BLE001 — dev harness
            failures += 1
            print(f"ERR  {name:18s} {type(e).__name__}: {e}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=set(sys.argv[2:]) or None))
