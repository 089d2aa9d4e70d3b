"""ANN quality: the pruned variants must retrieve a reasonable fraction
of the exact brute-force top-k (recall), not just match their own oracle."""

from __future__ import annotations

from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import (
    TOP_K,
    knn_brute,
    knn_ivf,
)


def test_ivf_recall_against_brute_force(spark, sf_dir):
    exact = {r["vec_id"] for r in knn_brute(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in knn_ivf(spark, sf_dir).collect()}
    assert len(exact) == TOP_K
    recall = len(exact & approx) / TOP_K
    # near-orthogonal synthetic vectors are a worst case for IVF; still,
    # probing 2/10 cells must beat random candidate selection (~0.2)
    assert recall >= 0.3, f"IVF recall {recall} too low"


def test_ivf_prunes_candidates(spark, sf_dir):
    """The IVF result must come from a strict candidate subset (an ANN
    property: it may differ from exact top-k; here we assert it is not
    secretly scanning everything by checking the probe list size)."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.similarity import (
        N_PROBE,
        _assign_cells,
        _centroid_df,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    e = load_table(spark, "embeddings", sf_dir)
    centroids = _centroid_df(e)
    n_cells = centroids.count()
    assign = _assign_cells(e, centroids, 1)
    cells = assign.groupBy("cell").count()
    assert cells.count() > N_PROBE  # multiple populated cells
    total = e.count()
    probed = (
        assign.join(
            _assign_cells(e.filter(F.col("vec_id") == 0), centroids, N_PROBE).select("cell"),
            "cell",
        ).count()
    )
    assert probed < total, "probe list did not prune anything"
    assert n_cells == 10
