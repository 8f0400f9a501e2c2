#!/usr/bin/env python3
"""Regenerate the scratch 10x ("sf1") scaling corpus from sf0.1 testdata —
the synthesis BASELINE.md's "Scaling evidence" sections describe (dev tool,
driver-side python; never part of the shipped library).

  documents: 10 copies; copy k translate-rotates the 9-letter set
    'etaonisrh' by k so cross-copy shingles diverge; k=9 wraps to identity,
    giving every doc exactly one exact twin (a realistic dup rate).
  embeddings: 10 copies; copy k element-rolls the vector by k — an
    isometry, so each copy preserves the sf0.1 point-cloud geometry while
    cross-copy cosine stays below the 0.4 near-dup threshold.
  events: 10 user_id/event_id-offset copies at the same timestamp layout,
    so per-user sessions/windows are preserved.

Usage: python3 tools/make_sf1.py [outdir=/tmp/graft_sf1]
Then:  SPARK_GRAFT_SF_DIR=<outdir> SPARK_GRAFT_ONLY='<regex>' \
         sbt -batch "runMain graft.Bench"
"""
import sys, os, shutil
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
LETTERS = "etaonisrh"  # high-frequency letters: every doc mutates


def rot(k: int) -> str:
    return LETTERS[k % len(LETTERS):] + LETTERS[:k % len(LETTERS)]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    copies = " UNION ALL ".join(
        f"""SELECT doc_id + {k * 10_000_000} AS doc_id,
                  translate(text, '{LETTERS}', '{rot(k)}') AS text,
                  lang, source, n_chars
           FROM read_parquet('{SRC}/documents.parquet')"""
        for k in range(10))
    con.execute(f"COPY ({copies}) TO '{OUT}/documents.parquet' (FORMAT parquet)")

    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    ecopies = " UNION ALL ".join(
        f"""SELECT vec_id + {k * 10_000_000} AS vec_id,
                  list_concat(embedding[{k % dim + 1}:{dim}],
                              embedding[1:{k % dim}]) AS embedding,
                  label
           FROM read_parquet('{SRC}/embeddings.parquet')"""
        for k in range(10))
    con.execute(f"COPY ({ecopies}) TO '{OUT}/embeddings.parquet' (FORMAT parquet)")

    vcopies = " UNION ALL ".join(
        f"""SELECT event_id + {k * 100_000_000} AS event_id, ts,
                  user_id + {k * 1_000_000} AS user_id,
                  event_type, value, props
           FROM read_parquet('{SRC}/events.parquet')"""
        for k in range(10))
    con.execute(f"COPY ({vcopies}) TO '{OUT}/events.parquet' (FORMAT parquet)")

    # star-schema tables pass through unchanged (scaling runs target the
    # documents/embeddings/events families)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

    for t in ["documents", "embeddings", "events"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
