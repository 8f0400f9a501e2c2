#!/usr/bin/env python3
"""10x scratch scaling corpus for the FACT tables (lineitem/orders) — the
pair make_sf1.py does not scale (it grows documents/embeddings/events only).

Replicates sf0.1's orders and lineitem 10x with the order-key space shifted
per replica (orderkey' = orderkey + k * 10^7), so join selectivity and
per-order fan-out are preserved exactly; every other table is copied
unchanged. Dev-side tool only (pyarrow) — never shipped Scala code.

Usage: python3 tools/make_fact10x.py /tmp/graft_fact10x
"""
import sys, os, shutil
import pandas as pd

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000


def main():
    out = sys.argv[1]
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "events",
              "documents", "embeddings"]:
        p = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(p):
            shutil.copy(p, os.path.join(out, f"{t}.parquet"))
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        base = pd.read_parquet(os.path.join(SRC, f"{t}.parquet"))
        reps = []
        for k in range(10):
            r = base.copy()
            r[key] = r[key] + k * SHIFT
            reps.append(r)
        df = pd.concat(reps, ignore_index=True)
        df.to_parquet(os.path.join(out, f"{t}.parquet"), index=False)
        print(t, len(df), "rows")


if __name__ == "__main__":
    main()
