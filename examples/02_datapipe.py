"""Training-data pipeline walkthrough on the driver's synthetic
corpus: dedup (exact, MinHash, connected-component clustering), text
quality / language ID, and embedding similarity search — the
operators a 100-TB curation job composes, here at sf0.001 so the run
finishes in ~2 min.

Run: python examples/02_datapipe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from openoa_spark.session import get_session  # noqa: E402
from openoa_spark import registry  # noqa: E402
from openoa_spark.datapipe import dedup, sampling, sketches, similarity, text  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-datapipe")
    docs = registry._t(spark, sf_dir, "documents")
    emb = registry._t(spark, sf_dir, "embeddings")

    print("== corpus ==")
    print("documents:", docs.count(), " embeddings:", emb.count())

    print("== exact dedup (normalized-text hash) ==")
    kept = dedup.exact_dedup(docs, "text", "doc_id")
    print("kept:", kept.count(), "of", docs.count())

    print("== near-dup clusters (MinHash LSH -> connected components) ==")
    clustered = dedup.near_dedup(docs, "text", "doc_id")
    print("after near-dedup:", clustered.count())

    print("== text analysis (one projection, one pass) ==")
    profile = docs.select(
        "doc_id",
        text.token_count("text").alias("tokens"),
        text.language_id("text").alias("lang"),
        text.quality_score("text").alias("quality"),
    )
    profile.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.round(F.avg("quality"), 3).alias("avg_quality"),
        F.sum("tokens").alias("tokens"),
    ).orderBy(F.desc("docs")).show()

    print("== similarity search ==")
    q = [round(__import__("math").sin(i + 1.0), 6) for i in range(64)]
    print("brute-force top-5 to a query vector:")
    similarity.brute_force_top_k(emb, "embedding", "vec_id", q, k=5).show()
    print("LSH-bucketed per-vector top-3 (scale path):")
    similarity.lsh_bucketed_neighbors(emb, "embedding", "vec_id", k=3).show(6)

    print("== corpus curation: keep-best dedup, mix weights, packing ==")
    best = dedup.near_dedup_keep_best(
        docs, "text", "doc_id", text.quality_score("text"),
        num_hashes=32, bands=8, jaccard_threshold=0.4,
    )
    print("keep-best near-dedup kept:", best.count())
    sampling.temperature_sampling_weights(docs, "lang", alpha=0.7).show()
    print("sequence-packing manifest (256-token blocks, 4 shards):")
    sampling.pack_sequences(
        docs, "doc_id", text.token_count("text"), block_tokens=256,
        num_shards=4,
    ).show(6)


    print("== mergeable sketches (rollup pattern) ==")
    rollup = sketches.hll_rollup(
        emb.withColumn("bucket", F.col("vec_id") % 4), "vec_id", ["bucket"]
    )
    sketches.hll_merge(rollup).select("distinct_estimate", "n_rows").show()

    print("== declarative data-quality gate (one aggregation pass) ==")
    from openoa_spark.operators.checks import Rule, run_checks

    run_checks(
        docs,
        [
            Rule("text_not_null", "not_null", "text"),
            Rule("doc_id_unique", "unique", "doc_id"),
            Rule("lang_known", "in_set", "lang",
                 {"values": ["en", "de", "fr", "es", "unk"]}),
            Rule("n_chars_sane", "in_range", "n_chars",
                 {"lo": 1, "hi": 1_000_000}),
        ],
    ).show()

    print("== deterministic dataset splits + weighted sampling ==")
    docs.withColumn("split", sampling.hash_split("doc_id")).groupBy(
        "split"
    ).count().orderBy("split").show()
    weighted = sampling.weighted_hash_sample(
        docs, "doc_id", "n_chars", base_fraction=0.3, ref_weight=1000.0
    )
    print("weighted sample (p ~ n_chars):", weighted.count(), "docs")

    print("== chunk-level dedup / LM scoring / token-budget mix ==")
    chunked = dedup.chunk_dedup(docs, "text", "doc_id", chunk_tokens=10)
    print("chunk-dedup survivors:", chunked.count())
    lm = text.char_bigram_lm_scores(docs, "text", "doc_id")
    lm.agg(
        F.round(F.min("bits_per_bigram"), 3).alias("min_bits"),
        F.round(F.avg("bits_per_bigram"), 3).alias("avg_bits"),
        F.round(F.max("bits_per_bigram"), 3).alias("max_bits"),
    ).show()
    budgeted = sampling.token_budget_select(
        docs.select("doc_id", text.token_count("text").alias("n_tokens")),
        "doc_id", "n_tokens", budget=5000,
    )
    print("docs selected for a 5000-token mix:", budgeted.count())

    print("== model-based quality filter (silver labels -> MLlib LR) ==")
    from openoa_spark.datapipe import quality_model as qm

    labeled = qm.silver_labels(qm.featurize(docs))
    model = qm.fit_quality_classifier(labeled)
    qm.score_documents(docs, model).groupBy("quality_pred").agg(
        F.count("*").alias("docs"),
        F.round(F.avg("quality_prob"), 3).alias("avg_prob"),
    ).orderBy("quality_pred").show()

    print("== Gopher rules / dominant-ngram repetition / span dedup ==")
    g = docs.select("source", text.gopher_flags("text").alias("g"))
    g.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum(
            (
                F.col("g.pass_word_count")
                & F.col("g.pass_mean_word_len")
                & F.col("g.pass_alpha_ratio")
                & F.col("g.pass_stopwords")
            ).cast("int")
        ).alias("pass_all"),
    ).orderBy("source").show(5)
    rep = text.top_ngram_char_frac(docs, "text", "doc_id", n=2)
    rep.agg(
        F.round(F.avg("rep_frac"), 3).alias("avg_top_bigram_frac"),
        F.sum((F.col("rep_frac") > 0.2).cast("int")).alias("over_gopher_0.2"),
    ).show()
    spans = dedup.duplicated_span_removal(docs, "text", "doc_id", 10)
    print("docs surviving span-level dedup:", spans.count())

    print("== embedding PCA -> persisted IVF index ==")
    reduced, evr = similarity.embedding_pca(emb, "embedding", 8, id_col="vec_id")
    print("top-8 explained variance:", [round(v, 3) for v in evr])
    idx_path = os.path.join(_ROOT, "spark-warehouse", "example_ivf")
    similarity.build_ivf_index(emb, "embedding", "vec_id", idx_path, n_clusters=8)
    print("IVF top-5 from the persisted index (2 probed lists):")
    similarity.query_ivf_index(spark, idx_path, q, k=5, n_probe=2).show()

    print("== corpus snapshot diff ==")
    from openoa_spark.operators import qa as qa_ops

    old_v = docs.where(F.col("doc_id") % 5 != 4)
    new_v = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.upper("text")).otherwise(F.col("text")),
    )
    qa_ops.table_diff(old_v, new_v, ["doc_id"]).groupBy("status").count().orderBy(
        "status"
    ).show()

    print("== one-call curation pipeline (per-stage ledger) ==")
    from openoa_spark.datapipe.pipeline import CurationConfig, curate_corpus

    cleaned, ledger = curate_corpus(
        docs,
        CurationConfig(
            redact_pii=True,      # map-only typed-placeholder scrub
            remove_boilerplate=True,  # corpus-frequency segment strip
            gopher_rules=False,   # synthetic word-salad has no stopwords
            max_top_bigram_frac=0.5,
            jaccard_threshold=0.5,
            sample_fraction=0.5,
        ),
    )
    for stage, n in ledger:
        print(f"  {stage:>24}: {n}")

    print("== CCNet perplexity buckets (head / middle / tail) ==")
    text.perplexity_buckets(docs, "text", "doc_id").groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("bits_per_bigram"), 3).alias("min_bits"),
        F.round(F.max("bits_per_bigram"), 3).alias("max_bits"),
    ).orderBy("min_bits").show()

    print("== chunking + int8 quantization (retrieval-index prep) ==")
    chunks = text.sliding_token_chunks(
        docs, "text", "doc_id", chunk_tokens=24, stride=16
    )
    chunks.agg(
        F.count("*").alias("chunks"),
        F.round(F.avg("n_tokens"), 1).alias("avg_tokens"),
    ).show()
    # quantize only the CURATION SURVIVORS' embeddings, materialized
    # once so the scale pass doesn't re-run the curation DAG
    from openoa_spark.datapipe.pipeline import quantize_surviving_embeddings

    quant = quantize_surviving_embeddings(
        cleaned.select(F.col("doc_id").alias("vec_id")),
        emb, id_col="vec_id", vec_col="embedding",
    )
    quant.agg(
        F.count("*").alias("surviving_vectors"),
        F.round(F.max("max_abs_err"), 4).alias("worst_reconstruction_err"),
    ).show()

    print("== bloom-prefiltered exact decontamination ==")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    overlap = text.bloom_decontaminate(corpus, bench, "text", "doc_id", n=3)
    overlap.where(F.col("contamination") > 0).agg(
        F.count("*").alias("contaminated_docs"),
        F.round(F.avg("contamination"), 4).alias("avg_contamination"),
    ).show()

    print("== IVF-PQ: compressed-code ANN search + measured recall ==")
    ivfpq = similarity.ivf_pq_search(
        emb, "embedding", "vec_id", q, dim=64,
        coarse_k=4, n_probe=2, m=8, k=16, iters=2, k_results=5,
    )
    ivfpq.show()
    similarity.pq_recall_at_k(
        emb, "embedding", "vec_id", [q], dim=64, m=8, k=16, iters=2,
        top=10,
    ).show()

    print("== measured ANN recall (LSH vs exact, query panel) ==")
    planes = similarity.random_hyperplanes(64, 8, seed=42)
    for probe in (0, 2):
        rec = similarity.lsh_recall_at_k(
            emb, "embedding", "vec_id", planes, k=3, query_fraction=0.1,
            max_queries=50, probe_bits=probe,
        )
        label = "single-probe" if probe == 0 else f"multi-probe({probe})"
        rec.agg(
            F.round(F.avg("recall"), 3).alias(f"mean_recall@3 {label}")
        ).show()


if __name__ == "__main__":
    main()
