#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (NOT part of the
library — dev-only validation). Compares each Verify parquet dump against
its DuckDB oracle under the strictest plausible interpretation: columns
sorted by name, rows sorted, exact value equality.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
            want = con.execute(sql).fetchdf()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(f"columns differ: {list(g.columns)} vs {list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"row count differs: {len(g)} vs {len(w)}")
            # exact compare, column by column for a useful error message.
            # NaN == NaN here: a float NULL can bridge as NaN on one side
            # and None on the other engine's path, and NaN != NaN would
            # false-fail a value-identical result
            def same(a, b):
                if a is None and b is None:
                    return True
                if isinstance(a, float) and isinstance(b, float) \
                        and math.isnan(a) and math.isnan(b):
                    return True
                return a == b
            for c in g.columns:
                gv, wv = g[c].tolist(), w[c].tolist()
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if not same(a, b):
                        raise AssertionError(
                            f"col {c} row {i}: spark={a!r} duckdb={b!r}")
            # raw (unsorted) order match too — queries promise ORDER BY parity
            if not got.reindex(sorted(got.columns), axis=1).equals(
                    want.reindex(sorted(want.columns), axis=1)):
                print(f"  [warn] {name}: values match sorted but raw row order differs")
            print(f"  PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"  FAIL {name}: {e}")
            n_fail += 1
    print(f"{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
