"""Wave 71: PCA power iteration, Weiszfeld geometric median, kNN vote."""

import math

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext70 import (
    _KNN_K,
    _KNN_QN,
    _PCA_D,
    q_geometric_median,
    q_knn_label_vote,
    q_pca_power_iteration,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def _head_vectors(spark):
    rows = load_table(spark, SF, "embeddings").select("embedding").collect()
    return [[float(x) for x in r.embedding[:_PCA_D]] for r in rows]


def test_pca_unit_norm_and_dominant_eigenpair(spark):
    row = q_pca_power_iteration(spark, SF).collect()[0]
    v = [getattr(row, f"loading_micro_{j}") / 1e6 for j in range(_PCA_D)]
    assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # unit loading
    assert v[0] >= 0  # sign convention
    lam = row.eigval_micro / 1e6
    assert lam > 0
    # numpy cross-check: loading ~ top eigenvector of the micro-rounded cov
    import numpy as np

    X = np.array(_head_vectors(spark))
    C = np.cov(X, rowvar=False, bias=True)
    C = np.floor(C * 1e6 + 0.5) / 1e6
    w, V = np.linalg.eigh(C)
    top = V[:, -1] * (1 if V[0, -1] >= 0 else -1)
    assert abs(abs(np.dot(top, v)) - 1.0) < 1e-2  # aligned up to residual
    assert abs(w[-1] - lam) < 1e-2 * max(1.0, w[-1])


def test_geometric_median_beats_mean_objective(spark):
    row = q_geometric_median(spark, SF).collect()[0]
    assert row.obj_last_micro <= row.obj_start_micro  # Weiszfeld descends
    y = [getattr(row, f"y_micro_{j}") / 1e6 for j in range(_PCA_D)]
    X = _head_vectors(spark)
    # the reported point's objective matches the reported objective
    obj = sum(
        max(math.sqrt(sum((xi - yi) ** 2 for xi, yi in zip(x, y))), 1e-9) for x in X
    ) / len(X)
    # obj_last is measured at the second-to-last iterate; allow slack
    assert abs(obj * 1e6 - row.obj_last_micro) < 0.05 * row.obj_start_micro


def test_knn_vote_rows_and_majority_bounds(spark):
    rows = q_knn_label_vote(spark, SF).collect()
    n_total = load_table(spark, SF, "embeddings").count()
    assert len(rows) == min(_KNN_QN, n_total)
    for r in rows:
        assert 1 <= r.votes <= _KNN_K
        assert r.correct == (r.pred_label == r.true_label)
        assert 0 <= r.pred_label <= 9


def test_wave71_plans_are_scale_safe(spark):
    for fn in (q_pca_power_iteration, q_geometric_median, q_knn_label_vote):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
