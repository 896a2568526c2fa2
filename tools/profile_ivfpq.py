#!/usr/bin/env python
"""Stage-level wall breakdown of ann_ivfpq_topk (VERDICT r4 task 5).

Times, at the bench geometry (sf0.1 embeddings, local[32]):
  1. L2 coarse-quantizer training (driver collect + numpy Lloyd)
  2. PQ codebook training (driver collect + per-subspace Lloyd)
  3. corpus cell assignment (+ residual re-centering) + PQ code assignment
  4. the full query (probe + ADC + rank), end to end
min-of-3 after one warm-up, matching the bench protocol.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(fn, n=3):
    fn()  # warm-up
    walls = []
    for _ in range(n):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(min(walls), 3)


def main() -> None:
    from docling_spark.session import get_spark
    from docling_spark.ops.similarity import (
        ann_ivfpq_topk, train_centroids_l2, train_pq_codebooks, pq_codes,
        _assign_cells, _centroid_df)
    from pyspark.sql import functions as F

    spark = get_spark(app="profile-ivfpq", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.localCheckpoint()  # isolate operator cost from the scan

    out = {}
    out["train_l2_cents"] = timed(lambda: train_centroids_l2(emb))
    cents_np = train_centroids_l2(emb)
    out["train_pq_books_residual"] = timed(
        lambda: train_pq_codebooks(emb, cents=cents_np, metric="l2"))
    books = train_pq_codebooks(emb, cents=cents_np, metric="l2")

    cents_df = _centroid_df(spark, cents_np)

    def corpus_codes():
        assign = _assign_cells(emb, 8, 64, 11, "vec_id", "embedding",
                               top_n=2, cents=cents_df, metric="l2")
        corpus = assign.filter(F.col("rn") == 1).select("vec_id", "v", "cell")
        corpus = corpus.join(F.broadcast(cents_df), "cell").withColumn(
            "rv", F.expr("zip_with(v, c, (a, b) -> a - b)")).drop("c")
        return pq_codes(corpus, books, "vec_id", vec_col="rv",
                        keep=["cell"]).count()

    out["assign_plus_codes"] = timed(corpus_codes)
    out["full_query"] = timed(
        lambda: ann_ivfpq_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10,
                               n_cells=8, n_probe=2).count())
    out["full_query_pretrained"] = timed(
        lambda: ann_ivfpq_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10,
                               n_cells=8, n_probe=2, centroids=cents_np,
                               codebooks=books).count())
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
