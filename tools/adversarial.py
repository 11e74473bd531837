#!/usr/bin/env python3
"""Adversarial-corpus gate: rebuild the dirty-data corpora that found the
round-6 robustness bugs and replay the full DuckDB oracle compare on each.

Every corpus is the sf0.001 tables with targeted damage injected:
  short   1- and 2-token documents (ANSI element_at OOB; inferred explode
          pre-filters evaluate shingle lambdas on filtered-out rows)
  nulldoc NULL / empty / whitespace-only document text (codec NPEs,
          md5/mean-of-empty divergences)
  nullev  events with NULL ts/type/value, NULL props, malformed JSON
          (as-of join null keys, json_valid, the valid-event contract)
  zerovec zero-norm + NULL embeddings (ANSI DIVIDE_BY_ZERO in cosine,
          dot products over NULL)
  unicode CJK / emoji / combining-char / fullwidth text (character-vs-byte
          indexing parity)
  longdoc 10k+-token and single-huge-line documents (chunk/packing window
          bounds, shingle-array blowup, regex scaling on one line)
  skew    90% of docs in ONE (lang, length-bucket) blocking cell, 90% of
          events from ONE user (hot-key correctness for the blocked
          pair-joins and per-user windows; the df caps and rank windows
          must absorb the hot cell, not explode it)

Usage: python3 tools/adversarial.py [corpus ...]   (default: all)
Requires: duckdb, pyarrow; sbt on PATH; run from the repo root.
"""
import glob
import os
import shutil
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
WORK = "/tmp/graft_adversarial"


def base_corpus(name):
    d = f"{WORK}/{name}"
    os.makedirs(d, exist_ok=True)
    for f in glob.glob(f"{SF}/*.parquet"):
        shutil.copy(f, d)
    return d


def docs_variant(name, values_sql):
    d = base_corpus(name)
    duckdb.sql(f"""
      COPY (SELECT * FROM '{SF}/documents.parquet'
            UNION ALL SELECT * FROM (VALUES {values_sql})
              t(doc_id, text, lang, source, n_chars))
      TO '{d}/documents.parquet' (FORMAT parquet)""")
    return d


def build_short():
    return docs_variant("short", """
      (9001, 'single', 'en', 'synthetic', 6),
      (9002, 'two words', 'en', 'synthetic', 9),
      (9003, 'exactly three tokens', 'en', 'synthetic', 20),
      (9004, 'single', 'en', 'synthetic', 6),
      (9005, 'two words', 'de', 'synthetic', 9)""")


def build_nulldoc():
    return docs_variant("nulldoc", """
      (9001, 'single', 'en', 'synthetic', 6),
      (9101, '', 'en', 'synthetic', 0),
      (9102, NULL, 'en', 'synthetic', NULL),
      (9103, '   ', 'en', 'synthetic', 3),
      (9201, 'regular text with several tokens here', NULL, 'synthetic', 38),
      (9202, 'other text with several tokens here', 'en', NULL, 36)""")


def build_nullev():
    d = base_corpus("nullev")
    t = pq.read_table(f"{SF}/events.parquet")
    # The three 'probe' rows are an event_type whose every valid event has
    # a NULL user_id AND a tiny group (<100 rows): exercises the vacuous
    # arms of a5_sketch_bounds (left join, n_vals<100) that an inner join /
    # unconditional percentile band would hash-fail on.
    extra = pa.table({
        "event_id": pa.array([990001, 990002, 990003, 990004,
                              990005, 990006, 990007], pa.int64()),
        # Authored in nanos, cast to whatever unit the driver generated the
        # source table with (it has shipped both ns and us across rounds).
        "ts": pa.array([None, 1704067200_000_000_000,
                        1704067300_000_000_000, 1704067400_000_000_000,
                        1704067500_000_000_000, 1704067600_000_000_000,
                        1704067700_000_000_000],
                       pa.timestamp("ns")).cast(t.schema.field("ts").type),
        "user_id": pa.array([5, None, 7, 8, None, None, None], pa.int64()),
        "event_type": pa.array(["click", "click", None, "purchase",
                                "probe", "probe", "probe"]),
        "value": pa.array([None, 42.5, 17.0, None, 1.0, 100.0, 5000.0],
                          pa.float64()),
        "props": pa.array(['{"k": 3}', None, "not json", "{}",
                           "{}", "{}", "{}"]),
    })
    pq.write_table(pa.concat_tables([t, extra]), f"{d}/events.parquet")
    return d


def build_zerovec():
    d = base_corpus("zerovec")
    duckdb.sql(f"""
      COPY (SELECT * FROM '{SF}/embeddings.parquet'
            UNION ALL SELECT 9001,
              CAST(list_transform(range(64), x -> 0.0) AS FLOAT[]), 3
            UNION ALL SELECT 9002, NULL, 4)
      TO '{d}/embeddings.parquet' (FORMAT parquet)""")
    return d


def build_longdoc():
    # 5000-token docs: a near-identical pair (exercises minhash/jaccard/
    # winnowing on big shingle sets), packing docs that span several budget
    # windows (seq-id gaps are legal), and multi-hundred-chunk chunking.
    d = base_corpus("longdoc")
    duckdb.sql(f"""
      COPY (SELECT * FROM '{SF}/documents.parquet'
        UNION ALL
        SELECT 9401,
          array_to_string(list_transform(range(5000),
            i -> 'tok' || CAST(i % 700 AS VARCHAR)), ' '),
          'en', 'synthetic', 0
        UNION ALL
        SELECT 9402,
          array_to_string(list_transform(range(5000),
            i -> 'tok' || CAST((CASE WHEN i = 2500 THEN 999999 ELSE i % 700 END) AS VARCHAR)), ' '),
          'en', 'synthetic', 0
        UNION ALL
        SELECT 9403,
          array_to_string(list_transform(range(3000),
            i -> 'w' || CAST(i AS VARCHAR)), ' '),
          'de', 'synthetic', 0)
      TO '{d}/documents.parquet' (FORMAT parquet)""")
    return d


def build_skew():
    # KEY SKEW, not dirty values (VERDICT r11 #5): 90% of documents land in
    # ONE (lang, length-bucket) blocking cell — the worst case for every
    # blocked pair-join (jaccard, SNM, minhash-band all key on lang and/or
    # a length/prefix block) — and 90% of events come from ONE user (hot
    # key for every per-user aggregate/window). Text is truncated to 25
    # tokens so the docs share length bucket 1 (bucketWidth=20), lang is
    # forced to 'en'; every 10th row keeps its original shape so the cold
    # keys still exist. n_chars is recomputed to stay consistent.
    d = base_corpus("skew")
    duckdb.sql(f"""
      COPY (SELECT doc_id,
              CASE WHEN doc_id % 10 = 0 THEN text
                   ELSE array_to_string(string_split(text, ' ')[1:25], ' ')
              END AS text,
              CASE WHEN doc_id % 10 = 0 THEN lang ELSE 'en' END AS lang,
              source,
              len(CASE WHEN doc_id % 10 = 0 THEN text
                       ELSE array_to_string(string_split(text, ' ')[1:25], ' ')
                  END) AS n_chars
            FROM '{SF}/documents.parquet')
      TO '{d}/documents.parquet' (FORMAT parquet)""")
    # duckdb preserves the source ts unit (ns/us) via * REPLACE, unlike a
    # hand-built arrow table
    duckdb.sql(f"""
      COPY (SELECT * REPLACE (
              CASE WHEN event_id % 10 = 0 THEN user_id ELSE 42 END AS user_id)
            FROM '{SF}/events.parquet')
      TO '{d}/events.parquet' (FORMAT parquet)""")
    return d


def build_unicode():
    return docs_variant("unicode", """
      (9301, '这是 一段 中文 文本 用于 测试 引擎 的 行为 这是 重复 的 文本', 'zh', 'syn', 36),
      (9302, 'emoji 🎉 test 🚀 with 🎉 repeated 🚀 emoji 🎉 tokens', 'en', 'syn', 50),
      (9303, 'café müller naïve façade œuvre söder déjà vu rôle für', 'fr', 'syn', 54),
      (9304, 'combining é chars à mixed ô text ü here í now é again', 'en', 'syn', 53),
      (9305, 'ｆｕｌｌｗｉｄｔｈ mixed ascii ここ テスト ひらがな カタカナ 漢字', 'zh', 'syn', 34)""")


BUILDERS = {
    "short": build_short,
    "nulldoc": build_nulldoc,
    "nullev": build_nullev,
    "zerovec": build_zerovec,
    "unicode": build_unicode,
    "longdoc": build_longdoc,
    "skew": build_skew,
}


def main():
    names = sys.argv[1:] or list(BUILDERS)
    failed = []
    for name in names:
        corpus = BUILDERS[name]()
        out = f"{WORK}/verify_{name}"
        shutil.rmtree(out, ignore_errors=True)
        print(f"=== {name}: Verify over {corpus}")
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {corpus} {out}"],
            capture_output=True, text=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "8")})
        crashes = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l]
        for c in crashes:
            print("  " + c)
        if r.returncode != 0:
            print(f"  sbt exited {r.returncode}")
            print("  " + "\n  ".join((r.stdout + r.stderr).splitlines()[-5:]))
        cmp = subprocess.run(
            [sys.executable, "tools/compare.py", corpus, out],
            capture_output=True, text=True)
        tail = cmp.stdout.strip().splitlines()
        fails = [l for l in tail if l.startswith("FAIL")]
        for f in fails:
            print("  " + f)
        print("  " + (tail[-1] if tail else
                      f"no compare output (exit {cmp.returncode}): "
                      f"{cmp.stderr.strip().splitlines()[-1:] or ''}"))
        # A broken harness must not read as a clean gate: any nonzero exit
        # from sbt or compare.py (crash, missing dump, oracle mismatch)
        # fails the corpus, not just explicit [verify]/FAIL lines.
        if crashes or fails or r.returncode != 0 or cmp.returncode != 0:
            failed.append(name)
    print("\nADVERSARIAL GATE:",
          "PASS" if not failed else f"FAIL ({', '.join(failed)})")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
