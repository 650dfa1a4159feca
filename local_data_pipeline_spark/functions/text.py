"""Text-analysis functions for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + a BPE-ish regex), document
fingerprinting, and shingling — all as Catalyst column expressions (built-in
``pyspark.sql.functions`` + higher-order lambdas), so they run JVM-side at
scan speed with no UDF serialization. Each has a straightforward ANSI-SQL
twin for the DuckDB oracle.

At 100 TB these are per-row map operations: no shuffle, fully parallel,
pushed into the same stage as the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword-hit language
#: heuristic. Deliberately small and public-knowledge; real pipelines swap
#: in fastText or CLD3 via a Pandas UDF.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "que", "pour"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
}

#: Whitespace tokenizer split pattern (shared with the SQL twin).
WS_SPLIT = r"\s+"

#: BPE-ish token pattern: runs of letters, runs of digits, or single
#: non-space punctuation — a crude public approximation of byte-pair
#: pre-tokenization (GPT-2-style regex families).
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed, lowercased text (empty → empty array)."""
    t = F.trim(F.lower(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS_SPLIT)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens — a cheap proxy for LLM token counts."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity)."""
    words = LANG_STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Pick the language whose stopword list hits most (ties → lexicographic
    language code order; zero hits → 'und')."""
    pairs = [(stopword_hits(text, lg), lg) for lg in sorted(LANG_STOPWORDS)]
    # Deterministic explicit fold (ties prefer earlier language code):
    expr = F.lit("und")
    best_hits = F.lit(0)
    for h, lg in pairs:
        is_better = h > best_hits
        expr = F.when(is_better, F.lit(lg)).otherwise(expr)
        best_hits = F.when(is_better, h).otherwise(best_hits)
    return expr


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    p = F.size(F.regexp_extract_all(text, F.lit(r"[.,;:!?'\"()\[\]-]"), 0))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    tc = token_count(text)
    return F.when(tc == 0, F.lit(0.0)).otherwise(
        stopword_hits(text, lang).cast("double") / tc
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation soup,
    reasonable stopword density. Weights are fixed and documented so the
    SQL twin reproduces them exactly."""
    tc = token_count(text).cast("double")
    len_score = F.least(tc / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text, "en") * 4, F.lit(1.0))
    return F.round(0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Used for exact dedup; identical in any engine."""
    return F.md5(F.regexp_replace(F.trim(F.lower(text)), WS_SPLIT, " "))


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles from a token-array column. IMPORTANT:
    pass a bound column (``F.col(...)``), not an inline ``tokens(text)``
    expression — higher-order functions are interpreted and re-evaluate an
    inlined subtree once per element access (measured ~10× slower)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(1))),
        # try_element_at: docs shorter than k tokens yield one partial
        # shingle (nulls skipped by concat_ws) instead of an ANSI
        # out-of-bounds error
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(t, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(grams)


#: PII patterns (public, deliberately simple — production pipelines use
#: dedicated detectors; these demonstrate the scrub-at-scan-speed shape).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Replace emails / phone numbers / SSNs / IPv4s with typed placeholder
    tokens. Pure regexp_replace chain — runs inside the scan stage."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN, "<SSN>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (for filtering/reporting)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)),
        "n_ssns": F.size(F.regexp_extract_all(text, F.lit(PII_SSN), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)),
    }


def strip_html(text: Column) -> Column:
    """Drop tags, unescape the common entities, collapse whitespace —
    the cheap scan-stage HTML-to-text pass (real pipelines follow with a
    DOM-aware extractor only where this heuristic fails)."""
    out = F.regexp_replace(text, r"<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


#: Rabin-Karp rolling-hash parameters (fixed, public constants).
#: modulus * base must fit in int64 (ANSI overflow checks): with the
#: Mersenne prime 2^31-1 and base 257, h*B + c < 2^40.
_RK_BASE = 257
_RK_MASK = (1 << 31) - 1


def char_codes(t: Column) -> Column:
    """Codepoint array of a string column (stage 1 of rolling hashing;
    bind the result to a column before passing on — HOF inlining note)."""
    return F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long"))


def rolling_hashes(codes: Column, k: int = 5) -> Column:
    """Rolling (Rabin-Karp-style) polynomial hash per character k-gram.
    ``codes`` must be a BOUND codepoint-array column (see char_codes).
    Returns array<bigint>, one hash per k-gram window."""
    n = F.size(codes)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))

    def window_hash(i: Column) -> Column:
        h = F.lit(0).cast("long")
        for j in range(k):
            c = F.coalesce(F.try_element_at(codes, i + j), F.lit(0))
            h = F.pmod(h * _RK_BASE + c, F.lit(_RK_MASK))
        return h

    return F.transform(idx, window_hash)


def winnow_from_hashes(hashes: Column, w: int = 4) -> Column:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken's MOSS scheme,
    public): the distinct sorted set of per-window minima of the rolling
    hashes. Any shared substring of length ≥ k+w-1 contributes a shared
    fingerprint — the standard local fingerprinting for near-dup/overlap
    detection. ``hashes`` must be a BOUND column (see rolling_hashes)."""
    n = F.size(hashes)
    starts = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, w)))
    return F.array_sort(F.array_distinct(mins))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (array<string>); the unit set for
    n-gram Jaccard and MinHash. Documents shorter than k words yield their
    whole text as a single shingle so they can still match exactly.
    Prefer the two-step ``tokens`` column + :func:`shingles_from_tokens`
    in hot paths (see that function's note)."""
    return shingles_from_tokens(tokens(text), k)
