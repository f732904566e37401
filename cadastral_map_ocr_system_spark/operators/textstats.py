"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting, and document
fingerprinting — all pure built-in column expressions (JVM-side,
whole-stage codegen; no Python in the hot path). These generalize the
reference's text-vs-noise scoring (confidence/length gates at
OCR/src/detect.py:366-368, keyword classifier at
OCR/src/comprehensive_detector.py:127-142) to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed stopword list for the heuristic scorers (ASCII, lowercase).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]

TOKEN_SPLIT_RE = r"\s+"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds a `tokens` array column (whitespace tokenization)."""
    return df.withColumn(
        "tokens", F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE)
    )


def token_counts(df: DataFrame) -> DataFrame:
    """Per-document token/char counts (BPE-ish subword estimate included:
    ceil(chars/4) mirrors the common ~4-chars-per-token rule)."""
    t = with_tokens(df)
    return t.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.ceil(F.length("text") / 4).cast("long").alias("n_subwords_est"),
    )


def quality_scores(df: DataFrame) -> DataFrame:
    """Heuristic quality features per document.

    stopword_ratio: fraction of tokens in STOPWORDS;
    avg_token_len:  mean token length;
    alpha_ratio:    fraction of chars that are letters or spaces.
    All rounded to 6 dp so results are comparable across engines.
    """
    t = with_tokens(df)
    n_tokens = F.size("tokens")
    n_stop = F.size(F.filter("tokens", lambda x: x.isin(STOPWORDS)))
    # sum(length(tok)) == length of the separator-less join: one
    # builtin concat instead of an interpreted per-element fold
    token_chars = F.length(F.array_join("tokens", ""))
    # count of [A-Za-z ] chars == total length minus the length after
    # deleting exactly those 53 chars: translate is a per-char table
    # lookup, ~3x faster than regexp_replace building the filtered
    # string (measured 2.1 s -> 0.7 s at sf1); same count for every
    # input because both enumerate the identical ASCII set
    _alpha = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ" "abcdefghijklmnopqrstuvwxyz" " "
    )
    alpha_chars = F.length("text") - F.length(
        F.translate(F.col("text"), _alpha, "")
    )
    return t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(token_chars / F.greatest(n_tokens, F.lit(1)), 6).alias(
            "avg_token_len"
        ),
        F.round(alpha_chars / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
    )


def lang_id(df: DataFrame, threshold: float = 0.05) -> DataFrame:
    """N-gram-free stopword-hit language heuristic: predict 'en' when the
    stopword ratio clears the threshold."""
    q = quality_scores(df)
    return q.select(
        "doc_id",
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
    )


def repetition_scores(df: DataFrame) -> DataFrame:
    """Within-document repetition signals (the Gopher/C4 rule family):
    highly repetitive documents are low-value training text even when
    their token counts and stopword ratios look fine.

      dup_token_ratio  1 - distinct_tokens / n_tokens   (array-native,
                       no shuffle)
      top_bigram_frac  occurrences of the document's most frequent
                       bigram / (n_tokens - 1); 0 when n_tokens < 2

    The bigram mode is computed ENTIRELY within the row: sort the
    document's bigram array, then the most frequent bigram's count is
    the longest run of equal adjacent elements — one O(k log k)
    array_sort plus one linear fold, no explode, no shuffle, no join
    (an earlier revision shipped every bigram through a
    groupBy(doc_id, bigram) + per-doc max + join-back: two corpus-wide
    exchanges of bigram text for a per-document statistic; guide §2.4
    "remove shuffles outright"). Identical by construction: equal
    strings are adjacent exactly once in a sorted array, and the
    longest such run IS the max group count.

    Returns (doc_id, n_tokens, dup_token_ratio, top_bigram_frac).
    """
    t = with_tokens(df).select("doc_id", "tokens")
    n = F.size("tokens")
    base = t.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            1 - F.size(F.array_distinct("tokens")) / F.greatest(n, F.lit(1)), 6
        ).alias("dup_token_ratio"),
        F.array_sort(
            F.zip_with(
                F.slice("tokens", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("tokens", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigrams_sorted"),
    )
    # fold state: (prev element, current run length, best run length);
    # x == NULL prev is NULL -> otherwise branch -> run restarts at 1
    run = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["run"] + F.lit(1)
    ).otherwise(F.lit(1))
    top_bg = F.aggregate(
        F.col("bigrams_sorted"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "dup_token_ratio",
        F.round(
            top_bg / F.greatest(F.col("n_tokens") - 1, F.lit(1)), 6
        ).alias("top_bigram_frac"),
    )


# PII patterns, written in the Java/RE2 common regex subset (no
# lookarounds, no backrefs) so Spark and any SQL oracle agree exactly.
# Order matters: emails first (an email contains digit runs a greedy
# phone pattern could bite into).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"(\+?[0-9]{1,3}[- .]?)?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub crawl text before it can reach a training shard: replace
    emails, phone numbers, and IPv4 literals with typed placeholders
    (<EMAIL>, <PHONE>, <IPV4>) and count what was removed per doc.

    Entirely Catalyst regexp expressions — whole-stage codegen, no
    Python in the loop, trivially linear at corpus scale. Patterns
    apply in declaration order on the progressively redacted text, so
    a digit run inside an email is never double-counted as a phone.

    Returns (doc_id, clean_text, n_email, n_phone, n_ipv4).
    """
    cur = F.col(text_col)
    exprs = []
    for name, pat in PII_PATTERNS:
        # regexp_count matches the same non-overlapping occurrences as
        # regexp_extract_all but never materializes the match array
        exprs.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return df.select("doc_id", cur.alias("clean_text"), *exprs)


def fingerprints(df: DataFrame) -> DataFrame:
    """Stable content fingerprint: md5 of the whitespace-normalized,
    lowercased text (md5 so any engine reproduces it bit-for-bit)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT_RE, " ")
    return df.select("doc_id", F.md5(norm).alias("fingerprint"))
