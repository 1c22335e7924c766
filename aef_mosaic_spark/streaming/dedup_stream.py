"""Streaming near-dup cluster maintenance (document arrival stream).

The batch-incremental operator (operators/dedup.py
update_near_duplicate_clusters) lifted onto Structured Streaming: each
microbatch of new documents

  1. appends to the icelite CORPUS table (idempotent on batch_id),
  2. recomputes the cluster assignment incrementally against the last
     committed assignment — candidates come only from the batch's band
     rows joined against the corpus band rows, old x old pairs are
     never generated,
  3. commits the updated full assignment as a new CLUSTERS snapshot
     carrying the batch_id.

Exactly-once by the same recipe as streaming/ingest.py: foreachBatch
is at-least-once, so both sinks are idempotent on batch_id — a
replayed microbatch whose batch_id is already in the snapshot chain is
skipped; the stream checkpoint prevents lost batches; atomic
put-if-absent snapshot commits prevent partial appends. The clusters
table keeps every assignment version (time travel over dedup state —
"which keep-list did the 2024-03 training run see" is a snapshot id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aef_mosaic_spark.operators.dedup import (
    minhash_band_rows, near_duplicate_clusters,
    update_near_duplicate_clusters,
)
from aef_mosaic_spark.sources.icelite import Icelite
from aef_mosaic_spark.streaming.ingest import applied_batch_ids


def make_cluster_sink(corpus: Icelite, clusters: Icelite, id_col: str,
                      text_col: str, threshold: float = 0.8,
                      k: int = 16, bands: int = 4,
                      bands_table: Icelite | None = None):
    """`bands_table` (optional) persists the LSH band-row index: each
    microbatch APPENDS only its own docs' band rows (idempotent on
    batch_id), so per-batch banding work is O(batch) instead of
    O(corpus) — the index IS the dedup state at 10^12 docs. Without
    it, band rows are recomputed from the corpus each batch."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batch_ids(clusters):
            return  # full replay of an applied batch
        spark = batch_df.sparkSession
        if batch_id not in applied_batch_ids(corpus):
            corpus.append(batch_df, summary={"batch_id": batch_id})
        # a crash BETWEEN commits replays here: applied appends are
        # skipped, the assignment recomputes from the last committed
        # prior — same result, one extra snapshot, no dupes
        band_rows_all = None
        if bands_table is not None:
            if batch_id not in applied_batch_ids(bands_table):
                bands_table.append(
                    minhash_band_rows(batch_df, id_col, text_col, k, bands),
                    summary={"batch_id": batch_id})
            band_rows_all = bands_table.read(spark)
        df_all = corpus.read(spark)
        new_ids = batch_df.select(F.col(id_col).alias("id")).distinct()
        if clusters.exists():
            prior = clusters.read(spark).select(id_col, "cluster_id")
            updated = update_near_duplicate_clusters(
                df_all, new_ids, prior, id_col, text_col,
                threshold=threshold, k=k, bands=bands,
                band_rows_all=band_rows_all)
        else:
            updated = near_duplicate_clusters(
                df_all, id_col, text_col,
                threshold=threshold, k=k, bands=bands)
        out = updated.select(
            id_col, "cluster_id",
            (F.col(id_col) == F.col("cluster_id")).alias("keep"))
        clusters.overwrite(out, summary={"batch_id": batch_id})

    return _sink


def stream_clusters_to_table(docs_stream: DataFrame, corpus_path: str,
                             clusters_path: str, checkpoint_dir: str,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             threshold: float = 0.8, k: int = 16,
                             bands: int = 4, timeout_s: int = 600,
                             bands_path: str | None = None) -> Icelite:
    """Drain the stream (availableNow) into the corpus + clusters
    tables (+ the persisted band index when bands_path is given);
    returns the clusters table handle."""
    corpus = Icelite(corpus_path)
    clusters = Icelite(clusters_path)
    _sink = make_cluster_sink(
        corpus, clusters, id_col, text_col, threshold=threshold, k=k,
        bands=bands,
        bands_table=Icelite(bands_path) if bands_path else None)
    q = (docs_stream.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_s)
    return clusters


def make_span_stats_sink(index: Icelite, stats: Icelite, id_col: str,
                         text_col: str, n: int = 8):
    """Streaming substring-dedup: each microbatch merges its gram
    counts into the persisted gram index (spans.update_span_index —
    CoW MERGE, O(batch grams)) and appends the batch's span stats to
    a stats table. Exactly-once on batch_id by the standard recipe:
    both sinks idempotent, replays of applied batches skipped. Stats
    rows are FINAL per doc (a doc's dup ratio reflects the corpus as
    of its arrival — the live-ingest semantics; the batch operator is
    the retrospective path)."""
    from aef_mosaic_spark.operators.spans import update_span_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batch_ids(stats):
            return
        spark = batch_df.sparkSession
        if batch_id in applied_batch_ids(index):
            # index already absorbed this batch (crash between
            # commits): recompute stats against the CURRENT index
            # without re-merging
            from aef_mosaic_spark.operators.spans import (_doc_stats,
                                                          _gram_rows)
            g = _gram_rows(batch_df, id_col, text_col, n)
            dup = index.read(spark).where(F.col("nd") >= 2).select("h")
            out = _doc_stats(g, dup, id_col)
        else:
            out = update_span_index(spark, index.path, batch_df,
                                    id_col, text_col, n=n,
                                    summary={"batch_id": batch_id})
        stats.append(out, summary={"batch_id": batch_id})

    return _sink


def stream_span_stats_to_table(doc_stream: DataFrame, index_path: str,
                               stats_path: str, checkpoint: str,
                               id_col: str = "doc_id",
                               text_col: str = "text", n: int = 8):
    sink = make_span_stats_sink(Icelite(index_path), Icelite(stats_path),
                                id_col, text_col, n=n)
    return (doc_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
