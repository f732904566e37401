"""Distributed connected components and duplicate-cluster resolution.

The corpus_dedup detectors stop at candidate/verified PAIRS; a real
dedup pipeline must resolve pairs into CLUSTERS and pick one survivor
per cluster (the reference resolves this within a document by greedy
scan order, OCR/src/detect.py:504-575 — across a corpus the same
decision needs a connected-components pass over the near-dup graph).

`connected_components` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", ACM SoCC 2014): O(log^2 n) rounds, each round two
groupBy+join passes. Two properties make it THE shape that survives
100 TB:

  - no adjacency materialization: each round touches edges as rows
    (groupBy-MIN + equi-join back), never collect_set — a component of
    10^8 members never becomes an array in one task (the degenerate-
    bucket hazard corpus_dedup caps; here it cannot arise at all);
  - monotone contraction toward min-labels: each round strictly lowers
    the potential, and at the fixed point the edge set IS the answer —
    a star from every component's min node to its members.

Driver loop notes: lineage is cut every round with
localCheckpoint(eager=True) (plan depth would otherwise double per
round and overwhelm the optimizer long before the data is the
problem), and the fixed point is detected by an exact signature
(edge count + sum of xxhash64(u, v)) — two scalar aggregates, no
subtract/anti-join of the full edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus_dedup import DEFAULT_MAX_BUCKET, lsh_jaccard_pairs
from .textstats import fingerprints


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Canonical (u, v) edge rows in both directions, self-loops
    dropped. Input columns are (u, v)."""
    fwd = edges.filter(F.col("u") != F.col("v"))
    return fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood.

    Emits (m, v) with m = min(N(u) + {u}) for each neighbor v > u.
    Connectivity-preserving (Kiveris et al., Lemma 1).

    The per-neighborhood minimum is a WINDOW min rather than a
    groupBy+join-back: both need every (u, v) row co-located by u, but
    the window does it in ONE exchange where the join shape takes two
    (agg exchange + join alignment) — and a hub node is no worse off,
    since the join would colocate its rows identically. Output is NOT
    deduplicated here; one distinct per round (in _small_star) bounds
    the growth, and large-star output is at most one row per directed
    input edge anyway."""
    w = Window.partitionBy("u")
    m = F.least(F.col("u"), F.min("v").over(w))
    return (
        _symmetrize(edges)
        .select(m.alias("mu"), "u", "v")
        .filter((F.col("v") > F.col("u")) & (F.col("mu") != F.col("v")))
        .select(F.col("mu").alias("u"), F.col("v").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects itself and all its
    strictly-smaller neighbors to the smallest of them.

    Operates on edges oriented large->small (u > v); emits (m, v) for
    every v in the small neighborhood other than m itself, plus
    (m, u). Same one-exchange window-min shape as _large_star; this is
    the round's single distinct."""
    w = Window.partitionBy("u")
    directed = _symmetrize(edges).filter(F.col("v") < F.col("u"))
    # the window min must be materialized in its own projection — a
    # window expression is not allowed inside explode(array(...))
    withm = directed.select("u", "v", F.min("v").over(w).alias("m"))
    pair = F.array(
        F.struct(F.col("m").alias("a"), F.col("v").alias("b")),
        F.struct(F.col("m").alias("a"), F.col("u").alias("b")),
    )
    return (
        withm.select(F.explode(pair).alias("e"))
        .select(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple:
    """Fixed-point detector: (row count, sum of per-edge xxhash64).
    Two scalar aggregates per round instead of a full-set anti-join.
    Probabilistic: an equal-count equal-hashsum collision between two
    DIFFERENT consecutive edge sets (~2^-64 per round) would end the
    loop one contraction early; at that probability it is not a
    practical concern, and the anti-join alternative would cost more
    than the round it guards."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
    assume_distinct: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`, where
    component is the minimum node id reachable from it. Works for any
    orderable id type (the fixtures use BIGINT doc_ids).

    Alternating large-star/small-star until the edge set is a fixed
    point — at which point every edge runs from a component's min node
    to one member, and the component map is a projection. Rounds are
    O(log^2 n) in theory, 3-5 in practice on dedup graphs (near-dup
    clusters are dense, so the first large-star already stars most of
    them); `max_iters` is a diverged-input guard, not a tuning knob —
    hitting it raises rather than returning a half-contracted graph.

    Singleton nodes never appear in `edges` by construction, so they
    are the CALLER's to union in (see `dedup_clusters`); emitting them
    here would require a second full pass over a node frame this
    operator does not have.
    """
    # lazy localCheckpoint + the signature aggregate = ONE job per
    # round: the signature action is the first computation of the
    # checkpointed plan, so it materializes the cut lineage as a side
    # effect (eager=True ran a separate materialization job first —
    # 2 jobs/round of pure scheduling overhead on a loop whose data is
    # tiny long before its round count is)
    # assume_distinct: callers whose edge frame is distinct loop-free
    # by construction (e.g. LSH-gated jaccard pairs: one row per
    # candidate pair, doc_a < doc_b) skip the initial canonicalization
    # exchange — the loop's invariants only need the INPUT edge set to
    # be a set, which such callers already guarantee.
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not assume_distinct:
        e = e.filter(F.col("u") != F.col("v")).distinct()
    e = e.localCheckpoint(eager=False)
    sig = _signature(e)
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds"
        )
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    centers = e.select(F.col("u").alias("node"), F.col("u").alias("component"))
    return members.union(centers).distinct()


def dedup_clusters(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.05,
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(doc_id, cluster) for EVERY input document: the end-to-end
    duplicate-cluster map, cluster = min doc_id of the full duplicate
    class (exact and near combined).

    Composition (each stage is the already-scale-audited path):
      1. exact fingerprint groups -> every doc's min-doc_id
         representative (map-side-partial groupBy, corpus_dedup);
      2. LSH-gated exact Jaccard >= threshold over the representatives
         (capped buckets, star fallback) -> near-dup edges;
      3. alternating-algorithm connected components over the edges;
      4. docs rejoin through their representative; representatives in
         no edge keep themselves as cluster (singletons).

    The star-pair cap (corpus_dedup) emits the min member x others
    instead of all pairs for over-cap buckets — exactly the edges CC
    needs, since transitive closure is what this operator computes:
    the cap changes candidate PAIR sets but never the CLUSTERS, which
    is why capping is safe for dedup (module docstring there).
    """
    # ONE fingerprint aggregation serves both consumers: the survivor
    # docs (rep, text) for the near-dup detector AND the rep map for
    # the final join project from the same groupBy(fingerprint)
    # MIN(struct) — the old shape ran a second corpus-wide
    # groupBy(fingerprint) just to get (fingerprint, rep), i.e. one
    # more full exchange of fingerprint rows (guide §2.4). Exchange
    # reuse shares the aggregation between the two branches; results
    # identical (exceptAll == 0; oracle parity green).
    from .corpus_dedup import TOKEN_SPLIT_RE

    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), TOKEN_SPLIT_RE, " ")
    surv_fp = (
        df.groupBy(F.md5(norm).alias("fingerprint"))
        .agg(F.min(F.struct("doc_id", "text")).alias("s"))
        .select(
            "fingerprint",
            F.col("s.doc_id").alias("rep"),
            F.col("s.text").alias("text"),
        )
    )
    survivors = surv_fp.select(F.col("rep").alias("doc_id"), "text")
    fpd = fingerprints(df)
    doc_rep = fpd.join(surv_fp.select("fingerprint", "rep"), "fingerprint").select(
        "doc_id", "rep"
    )
    edges = lsh_jaccard_pairs(
        survivors,
        k=k,
        threshold=threshold,
        n_hashes=n_hashes,
        bands=bands,
        max_bucket=max_bucket,
        pre_exact_dedup=False,
    )
    comp = connected_components(edges, assume_distinct=True)
    return (
        doc_rep.join(comp, doc_rep.rep == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("rep")).alias("cluster"),
        )
    )


def dedup_survivors(df: DataFrame, **kwargs) -> DataFrame:
    """One row per duplicate cluster: the surviving (min doc_id)
    document and the cluster size. Min-doc_id keep-first is this
    engine's own deterministic policy; the reference sorts candidates
    by confidence descending before its greedy keep
    (OCR/src/detect.py:504-575), i.e. it keeps the highest-confidence
    member of each fuzzy-duplicate group, not the first seen — corpus
    documents carry no confidence, so min doc_id is the deterministic
    stand-in (ADVICE r5)."""
    clusters = dedup_clusters(df, **kwargs)
    return clusters.groupBy(F.col("cluster").alias("doc_id")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
