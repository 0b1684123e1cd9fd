"""Dev harness: check a SUBSET of queries against their oracles.

    python scripts/check_some.py name1 name2 ... [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from check_oracle import normalize, to_pandas, value_hash  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))


def main(names: list[str], sf_dir: str) -> int:
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
    for name in names:
        fn = queries[name]
        sql = oracles.get(name)
        try:
            import time

            t0 = time.perf_counter()
            got = normalize(to_pandas(fn(sf_dir)))
            dt = time.perf_counter() - t0
            if sql is None:
                print(f"{name:22s} rows={len(got)} (no oracle) {dt:.1f}s")
                continue
            want = normalize(con.sql(sql).df())
            ok_rows = len(got) == len(want)
            ok_cols = list(got.columns) == list(want.columns)
            hg, hw = value_hash(got), value_hash(want)
            ok = ok_rows and ok_cols and hg == hw
            mark = "OK " if ok else "FAIL"
            print(
                f"{mark} {name:22s} rows {len(got)}/{len(want)} "
                f"cols={'=' if ok_cols else 'DIFF'} "
                f"hash {'=' if hg == hw else 'DIFF'} {dt:.1f}s"
            )
            if not ok:
                failures += 1
                if not ok_cols:
                    print("   ray cols:", got.columns.tolist())
                    print("   sql cols:", want.columns.tolist())
                else:
                    print("   ray head:\n", got.head(5))
                    print("   sql head:\n", want.head(5))
        except Exception as e:  # noqa: BLE001 — dev harness
            failures += 1
            import traceback

            traceback.print_exc()
            print(f"ERR  {name:22s} {type(e).__name__}: {e}")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    raise SystemExit(main(args, sf))
