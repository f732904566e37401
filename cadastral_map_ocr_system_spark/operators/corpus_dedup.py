"""Corpus-scale deduplication operators.

Generalizes the reference's within-document greedy dedup
(OCR/src/detect.py:384-417, 504-575 — see operators/dedup.py) to
across-document dedup over billions of rows:

  exact          hash-groupBy on a normalized-content fingerprint
  n-gram Jaccard shingle self-join + set arithmetic (exact, quadratic
                 in shared-shingle pairs — small/verification scale)
  MinHash + LSH  shingle -> k minhashes -> b bands -> bucket equi-join
                 (the 100 TB-scale path: candidate pairs only, never
                 all-pairs)
  SimHash        64-bit sign-of-weighted-bit-sums fingerprint with
                 Hamming-radius pairing

All hashing is md5-based so any engine reproduces results bit-for-bit
(cross-engine oracle checks; at cluster scale xxhash64 is a drop-in
speed upgrade).

Scale notes: shingling and minhash signatures are narrow (per-row);
the only shuffles are the band-bucket groupBy/join whose keys are
uniform by construction (hash values) — no skew. The LSH join's small
side is never broadcast (both sides are corpus-sized); the band hash
prefix makes it a co-partitioned equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import TOKEN_SPLIT_RE, fingerprints


# ------------------------------------------------------------- exact
def exact_dup_groups(df: DataFrame) -> DataFrame:
    """One row per distinct content: representative + duplicate count."""
    return (
        fingerprints(df)
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def exact_dedup_survivors(df: DataFrame) -> DataFrame:
    """Keep the min-doc_id document of every exact-duplicate group."""
    fp = fingerprints(df)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint")
    )


# ----------------------------------------------------------- shingles
def shingle_rows(df: DataFrame, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document.

    Built narrowly (array transform per row — no window, no shuffle,
    no per-doc sort): at corpus scale a window-based shingle pass would
    shuffle every token; this shuffles nothing. The distinct() is the
    only wide op and it feeds the downstream groupBy anyway.
    """
    toks = F.split(F.trim(F.lower("text")), TOKEN_SPLIT_RE)
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
        .distinct()
    )


# ------------------------------------------------------ n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame, k: int = 3, threshold: float = 0.05
) -> DataFrame:
    """Exact Jaccard over word k-gram shingle sets for every pair that
    shares at least one shingle. Quadratic in co-shingled pairs — the
    verification-scale path; use minhash_lsh_candidates at corpus scale."""
    sh = shingle_rows(df, k).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------- MinHash + LSH
def minhash_signatures(df: DataFrame, n_hashes: int = 16, k: int = 3) -> DataFrame:
    """(doc_id, seed, minhash): lexicographic min of md5(seed|shingle)."""
    sh = shingle_rows(df, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame, n_hashes: int = 16, bands: int = 4, k: int = 3
) -> DataFrame:
    """Banded LSH: docs agreeing on all rows of any band become a
    candidate pair. Returns distinct (doc_a, doc_b)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, k)
    banded = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"],
                    ),
                )
            ).alias("band_hash")
        )
    )
    # self-join: persist so the signature pipeline runs once, not twice
    banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# -------------------------------------------------------------- SimHash
def simhash(df: DataFrame, bits: int = 32) -> DataFrame:
    """Per-document SimHash fingerprint from token md5s.

    bit_i(doc) = 1 iff sum over tokens of (bit_i(md5(tok)) ? +1 : -1)
    is positive. Integer arithmetic only — deterministic everywhere.
    """
    toks = df.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), TOKEN_SPLIT_RE)).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sums)
    sig = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0)) for i in range(bits)),
        F.lit(0),
    )
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_pairs(df: DataFrame, bits: int = 32, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidate generation by bit-band blocking (split the signature into
    max_hamming+1 chunks; near pairs agree on >=1 chunk by pigeonhole),
    then exact Hamming verify — never an all-pairs product.
    """
    sig = simhash(df, bits)
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("simhash"), c * chunk_bits)
                    .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                    .alias("chunk_val"),
                )
                for c in range(n_chunks)
            ]
        )
    ).alias("c")
    blocked = sig.select("doc_id", "simhash", chunks).select(
        "doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.chunk_val").alias("chunk_val")
    ).persist()
    a = blocked.alias("a")
    b = blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
