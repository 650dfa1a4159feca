"""The two Python-UDF API classes the engine hadn't exercised yet:
grouped-aggregate pandas UDFs (UDAF) and Python UDTFs.

Placement guidance (PERF.md rules): these are the SLOW path — built-in
``pyspark.sql.functions`` stay JVM-side and whole-stage-codegen'd; a
grouped-agg pandas UDF pays one Arrow hop per group batch, and a
row-at-a-time UDTF pays per-row Python dispatch. Use them only where no
built-in composition expresses the semantics (here: an order-statistic
aggregate over the raw group values). The UDTF below exists to cover
the API surface; the equivalent explode shape (queries.py
``bigram_counts_documents``) is what production plans should use.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def trimmed_mean_udaf(v: pd.Series) -> float:
    """10%-trimmed mean (grouped-agg pandas UDF): drop exactly
    floor(n*0.1) lowest and highest values, exact-sum (math.fsum) the
    rest, round to 6 decimals. Rank-based trimming makes the definition
    engine-independent (equal boundary values contribute the same mean
    whichever copy is dropped), so a SQL oracle can reproduce it."""
    vals = v.dropna().sort_values().to_numpy()
    k = int(len(vals) * 0.1)
    kept = vals[k : len(vals) - k] if k else vals
    if len(kept) == 0:
        return float("nan")
    return round(math.fsum(kept) / len(kept), 6)


@F.pandas_udf(T.DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact median (grouped-agg pandas UDF). Even-count groups return
    the mean of the two middle values — pandas' and DuckDB's shared
    interpolation rule, so the oracle matches exactly."""
    return float(v.median())


class NGramsUDTF:
    """Python UDTF: (text, n) -> one row per word n-gram with its
    position. Register with ``spark.udtf.register("ngrams",
    ngrams_udtf)`` and call in SQL as a table function:

        SELECT d.doc_id, g.pos, g.ngram
        FROM documents d, LATERAL ngrams(d.text, 3) g

    Covers the UDTF API; the explode+aggregate shape is the fast path.
    """

    def eval(self, text: str, n: int):
        if not text or not n or n <= 0:
            return
        toks = text.strip().lower().split()
        for i in range(len(toks) - n + 1):
            yield (i, " ".join(toks[i : i + n]))


def make_ngrams_udtf():
    from pyspark.sql.functions import udtf

    return udtf(NGramsUDTF, returnType="pos int, ngram string")


class TokenRLEUDTF:
    """Python UDTF: (doc_id, text) -> one row per RUN of identical
    adjacent whitespace tokens (run-length encoding). Genuinely
    procedural row generation — the UDTF API's natural fit — with the
    doc_id passed through so the lateral caller needs no outer-column
    reference:

        SELECT t.doc_id, t.run_idx, t.token, t.run_len
        FROM documents d, LATERAL token_rle(d.doc_id, d.text) t

    Tokenization matches functions/text.tokens (trim, lower, split \\s+)
    so a SQL oracle can reproduce the runs with a lag/running-sum
    gaps-and-islands construction."""

    def eval(self, doc_id: int, text: str):
        toks = text.strip().lower().split() if text else []
        if not toks:
            return
        run_idx, run_len, cur = 1, 1, toks[0]
        for t in toks[1:]:
            if t == cur:
                run_len += 1
            else:
                yield (doc_id, run_idx, cur, run_len)
                run_idx, run_len, cur = run_idx + 1, 1, t
        yield (doc_id, run_idx, cur, run_len)


def make_token_rle_udtf():
    """Arrow-optimized when available (batches rows over Arrow instead of
    pickling one row at a time — the UDTF analog of a pandas UDF)."""
    from pyspark.sql.functions import udtf

    try:
        return udtf(
            TokenRLEUDTF,
            returnType=(
                "doc_id bigint, run_idx bigint, token string, run_len bigint"
            ),
            useArrow=True,
        )
    except Exception:  # pragma: no cover - older Spark without Arrow UDTFs
        return udtf(
            TokenRLEUDTF,
            returnType=(
                "doc_id bigint, run_idx bigint, token string, run_len bigint"
            ),
        )


def register_python_udfs(spark) -> None:
    """Register all under stable SQL names (idempotent)."""
    spark.udf.register("trimmed_mean", trimmed_mean_udaf)
    spark.udtf.register("ngrams", make_ngrams_udtf())
    spark.udtf.register("token_rle", make_token_rle_udtf())
