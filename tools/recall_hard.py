#!/usr/bin/env python3
"""Hard-recall corpus for the jaccard dfCap grid (VERDICT r12 #4).

The sf0.1 corpus's 74 true pairs all have bigram Jaccard >= 0.8, so the
r12 recall grid never exercised the 0.3-0.6 casualty band. This builds
/tmp/graft_recall_hard: sf0.1 plus TEMPLATE CLUSTERS of mid-band
near-dups with CONTROLLED min_df, so every grid cell is informative:

  - a cluster = m docs sharing an intact head (fraction 1-q of 40 tokens)
    with per-doc unique tails -> every within-cluster pair has exact
    bigram Jaccard (h-1)/(2N-h-1): q=0.25 -> 0.592, 0.35 -> 0.472,
    0.5 -> 0.322 (all tokens synthetic, so no collision with real docs);
  - every shared gram appears in exactly the m cluster docs -> the pair's
    min_df IS m, so the dfCap=c join finds the pair iff m <= c. Cluster
    sizes {10, 30, 60} straddle the shipped cap (50): m=10 survives every
    cap, m=30 only caps >= 30, m=60 only the cap-100 escalation.

Cluster plan per q in {0.25, 0.35, 0.5}: 6x m=10, 3x m=30, 2x m=60
(810 docs, 15,345 true pairs; all in block (en, bucket 2) = 40 tokens).

Usage: python3 tools/recall_hard.py   then
  SPARK_GRAFT_ONLY=x_jaccard_recall,x_jaccard_ngram \
    sbt -batch 'runMain graft.Verify /tmp/graft_recall_hard /tmp/graft_vhard'
  python3 tools/compare.py /tmp/graft_recall_hard /tmp/graft_vhard
"""
import glob
import os
import shutil

import duckdb

SF = "/root/testdata/sf0.1"
OUT = "/tmp/graft_recall_hard"
N = 40  # tokens per seeded doc -> length bucket 2 at bucketWidth=20


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for f in glob.glob(f"{SF}/*.parquet"):
        if not f.endswith("documents.parquet"):
            shutil.copy(f, OUT)
    rows = []
    did = 10_000_000
    cluster = 0
    for m, reps in ((10, 6), (30, 3), (60, 2)):
        for q in (0.25, 0.35, 0.5):
            for _ in range(reps):
                cluster += 1
                h = round(N * (1 - q))
                head = " ".join(f"c{cluster}w{i}" for i in range(h))
                for d in range(m):
                    tail = " ".join(
                        f"c{cluster}d{d}t{i}" for i in range(N - h))
                    text = f"{head} {tail}"
                    rows.append((did, text, "en", "hard_recall", len(text)))
                    did += 1
    con = duckdb.connect()
    con.execute("CREATE TABLE seeds(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO seeds VALUES (?,?,?,?,?)", rows)
    con.execute(f"""
      COPY (SELECT * FROM '{SF}/documents.parquet'
            UNION ALL BY NAME SELECT * FROM seeds)
      TO '{OUT}/documents.parquet' (FORMAT parquet)""")
    n_pairs = sum(reps * 3 * m * (m - 1) // 2
                  for m, reps in ((10, 6), (30, 3), (60, 2)))
    print(f"{OUT}: +{len(rows)} docs in {cluster} clusters "
          f"({n_pairs} seeded true pairs, J in {{0.322, 0.472, 0.592}})")


if __name__ == "__main__":
    main()
