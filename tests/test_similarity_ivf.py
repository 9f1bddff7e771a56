"""IVF ANN: probing a fraction of the KMeans cells must still recover
most of the exact brute-force top-k (recall), and cell assignment must
cover the corpus exactly once."""

from __future__ import annotations

from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
)
from commodity_price_forecasting_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings").cache()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    corpus = emb.filter(F.col("vec_id") != 0)

    exact = {r["vec_id"] for r in cosine_topk(emb, query_id=0, k=10).collect()}
    assigned, centers = ivf_assign(corpus, k=8)
    assert assigned.count() == corpus.count()
    assert len(centers) == 8

    # probing ALL cells must equal exact brute force
    full = {
        r["vec_id"]
        for r in ivf_topk(assigned, centers, qvec, k=10, n_probe=8).collect()
    }
    assert full == exact

    # probing 3/8 cells: meaningful recall with ~60% of the scan pruned
    pruned = {
        r["vec_id"]
        for r in ivf_topk(assigned, centers, qvec, k=10, n_probe=3).collect()
    }
    assert len(pruned & exact) >= 5
