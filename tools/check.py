#!/usr/bin/env python3
"""Local driver-mimic correctness check (NOT part of the library — a dev
tool mirroring the driver's DuckDB compare so oracle changes are testable
before a round snapshot).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run `python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [name...]`.

Compares each <name>.parquet under outDir against the oracle SQL in
outDir/oracle_sql.json executed by DuckDB over the sf parquet tables:
row count, schema (sorted column names), and a value hash over rows with
columns sorted by name — the driver's contract.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stable stringification: floats to 9 significant digits like the driver
    def cell(x):
        if isinstance(x, float):
            return f"{x:.9g}"
        if isinstance(x, (list, tuple)) or str(type(x)).endswith("ndarray'>"):
            return "[" + ",".join(cell(e) for e in x) + "]"
        return str(x)
    return df.apply(lambda c: c.map(cell))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        spark = pd.concat([pd.read_parquet(f) for f in
                           sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))],
                          ignore_index=True) if \
            glob.glob(os.path.join(out_dir, name, "*.parquet")) else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(spark)} rows)")
            n_skip += 1
            continue
        try:
            ora = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok_rows = len(spark) == len(ora)
        ok_schema = sorted(spark.columns) == sorted(ora.columns)
        # Driver-mirror strictness (round-7 lessons). The driver's value
        # hash is dtype-sensitive where this gate's stringification coerces:
        # (1) a DuckDB HUGEINT output renders float64 in fetchdf while Spark
        #     writes int64 — equal values, different hashes. Flag any
        #     int-vs-float dtype split on a shared column.
        # (2) array/list cells crash the driver's pandas sort (unhashable
        #     ndarray). Flag object columns holding sequences on either side.
        dtype_errs = []
        if ok_schema:
            for c in spark.columns:
                a_k, b_k = spark[c].dtype.kind, ora[c].dtype.kind
                if {a_k, b_k} == {"i", "f"} or {a_k, b_k} == {"u", "f"}:
                    dtype_errs.append(
                        f"col {c}: spark {spark[c].dtype} vs oracle "
                        f"{ora[c].dtype} (uncast HUGEINT in the oracle?)")
            for side, df in (("spark", spark), ("oracle", ora)):
                for c in df.columns:
                    if df[c].dtype.kind == "O" and len(df) and any(
                            isinstance(v, (list, tuple)) or
                            str(type(v)).endswith("ndarray'>")
                            for v in df[c].head(5)):
                        dtype_errs.append(
                            f"col {c} ({side}): array-valued cells — "
                            "driver comparator cannot sort these")
        if dtype_errs:
            print(f"FAIL  {name}: " + "; ".join(dtype_errs))
            n_fail += 1
            continue
        ok_hash = False
        if ok_rows and ok_schema:
            a, b = norm(spark), norm(ora)
            ok_hash = a.reset_index(drop=True).equals(b.reset_index(drop=True))
            if not ok_hash:
                neq = (a.values != b.values)
                i, j = map(int, list(zip(*neq.nonzero()))[0]) if neq.any() else (0, 0)
                print(f"FAIL  {name}: value mismatch at row {i} col "
                      f"{a.columns[j]}: spark={a.iloc[i, j]!r} oracle={b.iloc[i, j]!r}")
                n_fail += 1
                continue
        if ok_rows and ok_schema and ok_hash:
            print(f"pass  {name} ({len(spark)} rows)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: rows {len(spark)}/{len(ora)} "
                  f"schema {sorted(spark.columns)} vs {sorted(ora.columns)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
