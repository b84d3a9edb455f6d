"""Multimodal decode + corpus-hygiene walkthrough (round-6 surface):
real PNG/WAV decoding over binary columns, corrupt-payload routing,
fuzzy benchmark decontamination, leakage-safe splits, and
encoding-damage screening — the stages a multimodal curation job runs
between ingestion and training-mix assembly. Uses the driver's
synthetic corpus at sf0.001 (~2 min).

Run: python examples/04_multimodal_hygiene.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from openoa_spark import registry  # noqa: E402
from openoa_spark.datapipe import dedup, multimodal, sampling, text  # noqa: E402
from openoa_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-multimodal-hygiene")
    docs = registry._t(spark, sf_dir, "documents")

    print("== synthesize a binary image column (valid PNGs) ==")
    spec = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(16) + F.col("doc_id") % 32).cast("int").alias("_w"),
        (F.lit(16) + F.col("doc_id") % 24).cast("int").alias("_h"),
        (F.col("doc_id") * 7919 % 1000003).alias("_seed"),
    )
    media = multimodal.synthesize_png_column(spec)

    print("== header metadata (real byte-level IHDR parse) ==")
    meta = multimodal.image_metadata(media)
    meta.orderBy("media_id").show(3)

    print("== full pixel decode (zlib inflate + unfilter) -> stats ==")
    stats = multimodal.image_pixel_stats(media)
    stats.orderBy("media_id").show(3)

    print("== JPEG frame headers (r7: parser pinned on foreign files) ==")
    jspec = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(16) + F.col("doc_id") % 48).cast("int").alias("_w"),
        (F.lit(16) + F.col("doc_id") % 40).cast("int").alias("_h"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(1))
        .otherwise(F.lit(3)).cast("int").alias("_c"),
        (F.col("doc_id") * 6151 % 999979).alias("_seed"),
    )
    jmeta = multimodal.jpeg_metadata(multimodal.synthesize_jpeg_column(jspec))
    jmeta.orderBy("media_id").show(3)

    print("== corrupt-payload detection ==")
    corrupted = media.select(
        "media_id",
        F.when(
            F.col("media_id") % 13 == 0, F.expr("substring(content, 1, 20)")
        ).otherwise(F.col("content")).alias("content"),
    )
    bad = multimodal.image_metadata(corrupted).where(
        F.col("width").isNull()
    )
    print("corrupt payloads rediscovered from bytes:", bad.count())

    print("== fuzzy benchmark decontamination (MinHash cross-table) ==")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    flagged = dedup.minhash_decontaminate(
        corpus, bench, "text", "doc_id",
        num_hashes=32, bands=8, jaccard_threshold=0.4, hash_fn="md5",
    )
    n_bad = flagged.where("is_contaminated").count()
    print("near-duplicates of benchmark docs:", n_bad, "of", corpus.count())

    print("== leakage-safe train/val/test split ==")
    split = sampling.leakage_safe_split(
        docs, "text", "doc_id", seed=17,
        num_hashes=32, bands=8, jaccard_threshold=0.4, hash_fn="md5",
    )
    split.groupBy("split").count().orderBy("split").show()

    print("== encoding-damage screen ==")
    sig = text.encoding_damage_signals(docs, "text", "doc_id")
    sig.agg(
        F.sum(F.col("is_damaged").cast("int")).alias("damaged_docs"),
        F.sum("n_mojibake").alias("mojibake_digraphs"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
