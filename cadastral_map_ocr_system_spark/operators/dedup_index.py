"""Persisted dedup index + incremental duplicate-cluster maintenance.

At 100 TB the dedup pipeline's real operating mode is incremental: a
daily ingest batch must be deduped against the corpus WITHOUT
re-shingling 100 TB (the reference recomputes per run over one
document, OCR/src/detect.py:504-575; a corpus-scale engine cannot).
The index persists four small-relative-to-corpus tables:

  fp_index    (fingerprint, rep)      one row per distinct content
  band_index  (band, band_hash, doc_id) `bands` rows per survivor —
              the LSH postings the next batch probes
  edges       (doc_a, doc_b)          Jaccard-verified near-dup edges
  clusters    (doc_id, cluster)       current assignment, every doc

Per increment the engine scans ONLY the new batch (plus a selective
semi-join fetch of the few old candidate docs' texts for the Jaccard
verify — predicate-pushdown territory, not a corpus scan), probes the
band index with the SMALL side broadcast, and re-runs connected
components over the verified-edge graph (near-dup edges only — orders
of magnitude smaller than the corpus).

Maintenance at scale: increments APPEND to fp_index / band_index /
edges, so after many batches those directories accumulate small part
files (never duplicate rows — the anti-join and monotone ingest see
to that). `compact_dedup_index` is the vacuum: read -> repartition to
right-sized files -> crash-safe directory swap (OPTIMIZE under a real
Iceberg catalog). Correctness never depends on running it — it only
bounds the file-listing and task-granularity cost of the next probe.

EXACTNESS CONTRACT (test- and oracle-pinned): given monotone ingest
(every new doc_id greater than all indexed ones) and no LSH bucket
crossing the star-pair cap between increments, the incremental result
is IDENTICAL to a full recompute over the combined corpus — same
fingerprint reps (old rep ids are smaller by monotonicity), same
deterministic md5 LSH candidates, same Jaccard gate, same transitive
closure. The registry query's oracle is literally the full-recompute
SQL. When a bucket DOES cross the cap mid-life, full recompute would
star-pair the whole bucket while the index retains the finer old
edges — clusters can only be equal-or-finer-connected, never wrong
pairs; rebuild the index (build_dedup_index) to re-canonicalize.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .components import connected_components
from .corpus_dedup import (
    DEFAULT_MAX_BUCKET,
    _cap_report,
    _capped_pairs,
    _jaccard_over_pairs,
    lsh_jaccard_pairs,
    shingle_rows,
)
from .textstats import fingerprints

_BANDS = 4
_N_HASHES = 16
_K = 3
_THRESHOLD = 0.05


def _band_rows(docs: DataFrame, n_hashes: int, bands: int, k: int) -> DataFrame:
    """(doc_id, band, band_hash): the banded-LSH posting rows for each
    document — the row-per-band form corpus_dedup.lsh_buckets groups,
    kept ungrouped here because the index stores postings, not
    buckets."""
    from .corpus_dedup import band_hash_structs, minhash_sig_cols

    sig = minhash_sig_cols(docs, n_hashes=n_hashes, k=k)
    band_structs = band_hash_structs(n_hashes, bands)
    return sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def _doc_reps(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, rep): every doc joined to its exact-group
    min-doc_id representative."""
    fpd = fingerprints(docs)
    reps = fpd.groupBy("fingerprint").agg(F.min("doc_id").alias("rep"))
    return fpd.join(reps, "fingerprint").select("doc_id", "fingerprint", "rep")


def build_dedup_index(
    docs: DataFrame,
    index_path: str,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    k: int = _K,
    threshold: float = _THRESHOLD,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> None:
    """Full build: dedup the corpus from scratch and persist the four
    index tables. This is the bootstrap (and the re-canonicalization
    path if the cap caveat in the module docstring is ever hit)."""
    doc_reps = _doc_reps(docs)
    fp_index = doc_reps.select("fingerprint", "rep").distinct()
    survivors = docs.join(
        doc_reps.filter(F.col("doc_id") == F.col("rep")).select("doc_id"),
        "doc_id",
    ).select("doc_id", "text")
    edges = lsh_jaccard_pairs(
        survivors, k=k, threshold=threshold, n_hashes=n_hashes, bands=bands,
        max_bucket=max_bucket, pre_exact_dedup=False,
    ).select("doc_a", "doc_b")
    comp = connected_components(edges)
    clusters = (
        doc_reps.join(comp, doc_reps.rep == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("rep")).alias("cluster"),
        )
    )
    band_index = _band_rows(survivors, n_hashes, bands, k)
    # edges/clusters must be computed BEFORE overwriting (lazy plans);
    # a fresh build writes to a fresh dir, so plain writes suffice
    fp_index.write.mode("overwrite").parquet(f"{index_path}/fp_index")
    band_index.write.mode("overwrite").parquet(f"{index_path}/band_index")
    edges.write.mode("overwrite").parquet(f"{index_path}/edges")
    clusters.write.mode("overwrite").parquet(f"{index_path}/clusters")


def incremental_dedup(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    old_docs: DataFrame,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    k: int = _K,
    threshold: float = _THRESHOLD,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Assign every document of `new_docs` to a duplicate cluster and
    fold the batch into the index; returns the UPDATED full cluster
    map (doc_id, cluster) over old + new.

    Cost model per batch (the 100 TB property): one scan of the new
    batch, a broadcast probe of the band index with the new side
    small, a semi-join fetch of only the candidate old docs' texts,
    and connected components over the near-dup EDGE graph — never a
    scan or re-shingle of the old corpus. `old_docs` is used solely
    for the selective candidate-text fetch.

    Requires monotone ingest: every new doc_id must exceed every
    indexed doc_id (asserted), so stored reps stay min and stored
    edges stay canonically ordered.
    """
    fp_index = spark.read.parquet(f"{index_path}/fp_index")
    band_index = spark.read.parquet(f"{index_path}/band_index")
    old_edges = spark.read.parquet(f"{index_path}/edges")
    old_clusters = spark.read.parquet(f"{index_path}/clusters")

    max_old = old_clusters.agg(F.max("doc_id")).first()[0]
    min_new = new_docs.agg(F.min("doc_id")).first()[0]
    if max_old is not None and min_new is not None and min_new <= max_old:
        raise ValueError(
            f"monotone-ingest violation: new doc_id {min_new} <= indexed "
            f"max {max_old} — rebuild with build_dedup_index instead"
        )

    # --- stage 1: exact dedup against the index -------------------
    # in-batch exact groups first (map-side-collapsible), then probe
    # the fingerprint index: a known fingerprint inherits its stored
    # rep; an unknown one makes its batch-min doc the new survivor
    batch_reps = _doc_reps(new_docs)
    probed = batch_reps.join(
        fp_index.select("fingerprint", F.col("rep").alias("old_rep")),
        "fingerprint",
        "left",
    )
    new_doc_reps = probed.select(
        "doc_id",
        "fingerprint",
        F.coalesce(F.col("old_rep"), F.col("rep")).alias("rep"),
    )
    new_survivor_ids = (
        probed.filter(F.col("old_rep").isNull() & (F.col("doc_id") == F.col("rep")))
        .select("doc_id")
    )
    new_survivors = new_docs.join(new_survivor_ids, "doc_id").select(
        "doc_id", "text"
    )

    # --- stage 2: LSH candidates (new x old via index, new x new) --
    # materialized once: three consumers (old-probe, new-new buckets,
    # the index append), and the batch side is small by definition
    new_bands = _band_rows(new_survivors, n_hashes, bands, k).localCheckpoint(
        eager=True
    )
    cand_old = (
        F.broadcast(new_bands.withColumnRenamed("doc_id", "doc_b"))
        .join(
            band_index.withColumnRenamed("doc_id", "doc_a"),
            ["band", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand_new = (
        new_bands.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(_capped_pairs("ids", max_bucket)).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    candidates = cand_old.union(cand_new).distinct()

    # --- stage 3: Jaccard verify over candidate texts only ---------
    # old candidate texts come from a semi-join fetch (pushdown), new
    # from the batch; shingling touches just these docs
    old_cand_docs = old_docs.join(
        candidates.select(F.col("doc_a").alias("doc_id")).distinct(), "doc_id"
    ).select("doc_id", "text")
    sh = shingle_rows(old_cand_docs.union(new_survivors), k)
    new_edges = _jaccard_over_pairs(candidates, sh, threshold).select(
        "doc_a", "doc_b"
    )

    # --- stage 4: components over the verified-edge graph ----------
    all_edges = old_edges.union(new_edges).distinct()
    comp = connected_components(all_edges)
    all_doc_reps = old_clusters.select(
        "doc_id", F.col("cluster").alias("rep")
    ).union(new_doc_reps.select("doc_id", "rep"))
    # old docs' stored cluster is their component's min id, which is a
    # graph NODE (or an untouched singleton rep) — rejoining through
    # it lands on the merged component
    updated = (
        all_doc_reps.join(comp, all_doc_reps.rep == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("rep")).alias("cluster"),
        )
    )

    # --- fold the batch into the index ------------------------------
    # every derived frame's plan reads the live index files, so ALL of
    # them are eagerly materialized (localCheckpoint) BEFORE any write
    # touches the index — otherwise an append lands in a directory a
    # later plan re-lists, silently changing its input mid-update
    new_fp = (
        new_doc_reps.select("fingerprint", "rep")
        .distinct()
        .join(fp_index.select("fingerprint"), "fingerprint", "left_anti")
        .localCheckpoint(eager=True)
    )
    new_edges = new_edges.localCheckpoint(eager=True)
    updated = updated.localCheckpoint(eager=True)

    # fp_index is appended LAST (ADVICE r5 medium): the fp probe is
    # what makes a retried batch see its docs as already indexed, so
    # if a crash interleaves these non-atomic appends, the retry must
    # re-process the batch rather than silently skip its band postings
    # and edges. Re-appended band/edge rows from such a retry are
    # harmless — every consumer runs distinct() over them — and the
    # clusters overwrite is idempotent.
    new_bands.write.mode("append").parquet(f"{index_path}/band_index")
    new_edges.write.mode("append").parquet(f"{index_path}/edges")
    updated.write.mode("overwrite").parquet(f"{index_path}/clusters")
    new_fp.write.mode("append").parquet(f"{index_path}/fp_index")
    return updated


def incremental_capped_buckets(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    k: int = _K,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """No-silent-caps ledger for `incremental_dedup`'s new-new
    candidate buckets (the new-old probe is a join, never a pair
    expansion, so only the in-batch buckets can hit the star cap).
    Empty unless the cap engaged — run and log it alongside each
    batch, exactly like corpus_dedup.lsh_capped_buckets at full-build
    time. A non-empty ledger is also the signal that the exactness
    contract's no-cap-crossing precondition needs checking (module
    docstring)."""
    fp_index = spark.read.parquet(f"{index_path}/fp_index")
    batch_reps = _doc_reps(new_docs)
    probed = batch_reps.join(
        fp_index.select("fingerprint", F.col("rep").alias("old_rep")),
        "fingerprint",
        "left",
    )
    survivor_ids = probed.filter(
        F.col("old_rep").isNull() & (F.col("doc_id") == F.col("rep"))
    ).select("doc_id")
    new_survivors = new_docs.join(survivor_ids, "doc_id").select("doc_id", "text")
    buckets = (
        _band_rows(new_survivors, n_hashes, bands, k)
        .groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
    )
    return _cap_report(buckets, "ids", max_bucket)


# target parquet file size for compacted index tables; postings rows
# are ~50 bytes so this lands near the 128 MB lakehouse sweet spot
_COMPACT_ROWS_PER_FILE = 2_000_000

_APPEND_TABLES = ("fp_index", "band_index", "edges")


def _repair_torn_compact(table_dir: str) -> None:
    """Make a table directory readable again after a compaction crash.

    The swap below passes through exactly two non-live states:
      1. `.compact` written, live intact      -> drop `.compact`
      2. live renamed to `.old`, `.compact`
         complete, live missing               -> promote `.compact`
    A complete `.compact` always carries _SUCCESS (Spark commits it);
    anything else is a partial write and is discarded.
    """
    tmp, old = table_dir + ".compact", table_dir + ".old"
    if not os.path.exists(table_dir):
        if os.path.exists(os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, table_dir)
        elif os.path.exists(old):
            os.rename(old, table_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def compact_dedup_index(
    spark: SparkSession,
    index_path: str,
    rows_per_file: int = _COMPACT_ROWS_PER_FILE,
) -> dict:
    """Vacuum the three append-grown index tables (fp_index,
    band_index, edges): rewrite each as ceil(rows / rows_per_file)
    right-sized parquet files, swapping directories crash-safely
    (write `.compact` -> rename live to `.old` -> promote -> drop
    `.old`; `_repair_torn_compact` recovers every intermediate state,
    exercised by tests/test_dedup_index.py).

    Run it on the cadence a lakehouse OPTIMIZE would run — after every
    N increments — purely to bound file-listing and task-granularity
    cost of the next batch's probe; results are byte-identical with or
    without it (the registry's dedup_incremental query compacts
    mid-run and still hashes against the full-recompute oracle).
    band_index is repartitioned BY (band, band_hash) so a compacted
    probe join reads co-clustered postings. Returns a per-table
    {files_before, files_after, rows} report (no silent maintenance).
    """
    report: dict[str, dict] = {}
    for table in _APPEND_TABLES:
        live = f"{index_path}/{table}"
        _repair_torn_compact(live)
        files_before = len(glob.glob(os.path.join(live, "*.parquet")))
        df = spark.read.parquet(live)
        n_rows = df.count()
        n_files = max(1, -(-n_rows // rows_per_file))
        if table == "band_index":
            out = df.repartition(n_files, "band", "band_hash")
        else:
            out = df.repartition(n_files)
        tmp, old = live + ".compact", live + ".old"
        out.write.mode("overwrite").parquet(tmp)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)
        report[table] = {
            "files_before": files_before,
            "files_after": len(glob.glob(os.path.join(live, "*.parquet"))),
            "rows": n_rows,
        }
    return report
