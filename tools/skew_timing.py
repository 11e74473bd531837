#!/usr/bin/env python3
"""Skew TIMING corpora (VERDICT r12 #5 / r11 #5 second half).

Two sf0.1-derived corpora with IDENTICAL text mass and doc counts that
differ only in blocking-key distribution, so a timing delta on the
blocked pair-join family (x_jaccard_ngram, x_snm_pairs, x_minhash_pairs)
measures exactly the hot-cell effect:

  hot  (/tmp/graft_skew_hot): 90% of docs truncated to 25 tokens and
       forced into ONE (lang='en', length-bucket 1) blocking cell; 90%
       of events re-keyed to ONE user.
  ctl  (/tmp/graft_skew_ctl): the SAME truncation applied to the SAME
       docs, but scattered across 50 synthetic langs ('enNN') -> 50
       equal cells; events scattered across 50 users.

Every 10th row keeps its original shape in both, so cold keys exist.

Usage: python3 tools/skew_timing.py, then per corpus
  SPARK_GRAFT_SF_DIR=/tmp/graft_skew_hot \
    SPARK_GRAFT_ONLY=x_jaccard_ngram,x_snm_pairs,x_minhash_pairs \
    SPARK_GRAFT_CPUS=32 sbt -batch 'runMain graft.Bench'
"""
import glob
import os
import shutil

import duckdb

SF = "/root/testdata/sf0.1"


def build(out, lang_sql, user_sql):
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in glob.glob(f"{SF}/*.parquet"):
        if not (f.endswith("documents.parquet") or f.endswith("events.parquet")):
            shutil.copy(f, out)
    duckdb.sql(f"""
      COPY (SELECT doc_id,
              CASE WHEN doc_id % 10 = 0 THEN text
                   ELSE array_to_string(string_split(text, ' ')[1:25], ' ')
              END AS text,
              CASE WHEN doc_id % 10 = 0 THEN lang ELSE {lang_sql} END AS lang,
              source,
              len(CASE WHEN doc_id % 10 = 0 THEN text
                       ELSE array_to_string(string_split(text, ' ')[1:25], ' ')
                  END) AS n_chars
            FROM '{SF}/documents.parquet')
      TO '{out}/documents.parquet' (FORMAT parquet)""")
    duckdb.sql(f"""
      COPY (SELECT * REPLACE (
              CASE WHEN event_id % 10 = 0 THEN user_id
                   ELSE {user_sql} END AS user_id)
            FROM '{SF}/events.parquet')
      TO '{out}/events.parquet' (FORMAT parquet)""")
    print(f"{out}: built")


def main():
    build("/tmp/graft_skew_hot", "'en'", "42")
    build("/tmp/graft_skew_ctl",
          "'en' || CAST(doc_id % 50 AS VARCHAR)",
          "CAST(user_id % 50 AS BIGINT)")


if __name__ == "__main__":
    main()
