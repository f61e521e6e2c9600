"""Name → callable registry of the (spark, sf_dir) pipeline operators.

One map shared by the CLI ``pipeline`` subcommand (spark-submit path) and
``tools/pipeline_sweep.py`` (scale benchmarking), so an operator added to
the package is runnable from a cluster submit without further wiring.
Every entry takes ``(spark, sf_dir)`` — the same signature the driver gate
uses — and returns a DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Op = Callable[[SparkSession, str], DataFrame]


def pipeline_ops() -> dict[str, Op]:
    from miru_spark.pipeline import dedup, quantize, similarity, text

    return {
        # dedup family
        "dedup_exact": dedup.dedup_exact,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_neardup_pairs": dedup.simhash_neardup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_survivors": dedup.dedup_survivors,
        "dedup_incremental": dedup.dedup_incremental,
        "decontaminate": dedup.decontaminate,
        "span_dedup_stats": dedup.span_dedup_stats,
        # similarity family
        "cosine_topk": similarity.cosine_topk_bruteforce,
        "ivf_topk": similarity.ivf_topk,
        "ivf_train": similarity.ivf_train,
        "lsh_ann_topk": similarity.lsh_ann_topk,
        "lsh_ann_batch": similarity.lsh_ann_batch,
        "lsh_ann_partitioned": similarity.lsh_ann_partitioned,
        "lsh_bucket_stats": similarity.lsh_bucket_stats,
        "embedding_neardup": similarity.embedding_neardup_pairs,
        "embedding_neardup_lsh": similarity.embedding_neardup_lsh,
        "pq_train": quantize.pq_train,
        "pq_topk": quantize.pq_topk,
        "pq_rerank": quantize.pq_rerank_topk,
        "ivfpq_topk": quantize.ivfpq_topk,
        "ivfpq_rerank": quantize.ivfpq_rerank_topk,
        # text family
        "token_counts": text.token_counts,
        "quality_scores": text.quality_scores,
        "training_shards": text.training_shards,
        "lang_id": text.lang_id,
        "doc_fingerprints": text.doc_fingerprints,
        "winnow_fingerprints": text.winnow_fingerprints,
        "stratified_split": text.stratified_split,
        "ngram_repetition": text.ngram_repetition,
        "domain_quota_sample": text.domain_quota_sample,
        "pack_sequences": text.pack_sequences,
        "mixture_resample": text.mixture_resample,
        "epoch_build": text.epoch_build,
        # (multimodal ops take a media relation, not an sf_dir — they are
        # driven via pipeline.multimodal.synthesize_media / extract_features
        # directly and are out of this (spark, sf_dir) registry on purpose)
    }
