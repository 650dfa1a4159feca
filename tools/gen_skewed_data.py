"""Plant production-grade skew into a scaled corpus (VERDICT r9 #5).

The replicated sfK corpora are near-uniform on join/group keys; real
100 TB corpora are Zipf-skewed. This variant copies SRC (default the
/tmp/sf1 roster corpus) into OUT with three planted hot spots, each
aimed at one family of skew guards:

- **hot token at 10% df** (documents): every ``doc_id % 10 == 3`` doc
  gets the token ``zzhotstop`` appended — a stop-word-grade posting
  list that fans |anchors|x5000 pairs through ONE hash partition
  unless ``salt_hot_postings`` spreads it.
- **near-dup clique of 10^4** (documents): every ``doc_id % 5 == 1``
  doc's text is REPLACED by one fixed template — 10,000 byte-identical
  docs, the boilerplate cliff that makes every unguarded pair-emitting
  dedup op emit 5·10^7 pairs from a single bucket/fingerprint. The
  guards under test: lsh ``max_bucket_size``, winnowing ``max_df``.
- **hot graph node at ~10% degree** (lineitem): every
  ``l_orderkey % 10 == 7`` line's ``l_partkey`` is rewritten to one
  hot part, so ~10% of co-purchase edges touch a single node — the
  neighbor-aggregation straggler for LPA/pagerank shapes.
- **hot user at 10% of events** (events): every ``event_id % 10 == 4``
  event lands on user 424242 — one giant session-window partition.

The two document predicates are disjoint (mod-10 residue 3 vs mod-5
residue 1 → residues {1, 6} mod 10), so each hot spot is attributable.

Usage: python tools/gen_skewed_data.py [SRC] [OUT]
"""

from __future__ import annotations

import os
import sys

import duckdb

CLIQUE_TEXT = (
    "standard boilerplate legal disclaimer paragraph repeated verbatim "
    "across the corpus the quick brown fox jumps over the lazy dog and "
    "then proceeds to enumerate terms conditions warranties limitations "
    "liabilities and indemnities in the exact same order every time"
)
HOT_PART = 1
HOT_USER = 424242


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    plain = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "embeddings",
    ]
    for t in plain:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
    con.execute(
        f"""COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id % 5 = 1 THEN '{CLIQUE_TEXT}'
                 WHEN doc_id % 10 = 3 THEN text || ' zzhotstop'
                 ELSE text END AS text)
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{out}/documents.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)"""
    )
    con.execute(
        f"""COPY (
          SELECT * REPLACE (
            CASE WHEN l_orderkey % 10 = 7 THEN {HOT_PART}
                 ELSE l_partkey END AS l_partkey)
          FROM read_parquet('{src}/lineitem.parquet')
        ) TO '{out}/lineitem.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)"""
    )
    con.execute(
        f"""COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % 10 = 4 THEN {HOT_USER}
                 ELSE user_id END AS user_id)
          FROM read_parquet('{src}/events.parquet')
        ) TO '{out}/events.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)"""
    )
    for t, pred in [
        ("documents", "doc_id % 5 = 1"),
        ("documents", "contains(text, 'zzhotstop')"),
        ("lineitem", f"l_partkey = {HOT_PART}"),
        ("events", f"user_id = {HOT_USER}"),
    ]:
        n, tot = con.execute(
            f"SELECT sum(CASE WHEN {pred} THEN 1 ELSE 0 END), count(*) "
            f"FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {pred} -> {n}/{tot} ({100.0 * n / tot:.1f}%)")
    print(f"wrote {out}")


if __name__ == "__main__":
    raise SystemExit(main())
