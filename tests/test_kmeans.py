"""operators.kmeans: deterministic Lloyd's iterations + IVF search."""

import pytest

from pyspark.sql import functions as F

from qwery_spark.operators.kmeans import assign_cells, ivf_topk, kmeans_fit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_distortion_monotone_nonincreasing(emb):
    _, distortion = kmeans_fit(emb, k=4, iters=3)
    assert len(distortion) == 3
    assert all(b <= a + 1e-9 for a, b in zip(distortion, distortion[1:]))


def test_cells_partition_corpus(emb):
    cents, _ = kmeans_fit(emb, k=4, iters=2)
    n = emb.count()
    counts = assign_cells(emb, cents).groupBy("cell").count().collect()
    assert sum(r["count"] for r in counts) == n
    assert all(0 <= r["cell"] < 4 for r in counts)


def test_deterministic_refit(emb):
    c1, d1 = kmeans_fit(emb, k=4, iters=2)
    c2, d2 = kmeans_fit(emb, k=4, iters=2)
    assert d1 == d2
    assert c1 == c2


def test_ivf_topk_recall_against_brute_force(emb):
    """n_probe=ALL cells == brute force exactly; n_probe=2 returns k
    rows whose cosines are a subset of the full ranking."""
    from qwery_spark.operators.similarity import cosine_topk

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    corpus = emb.filter("vec_id <> 0")
    cents, _ = kmeans_fit(emb, k=4, iters=2)
    full = ivf_topk(corpus, cents, qvec, k=10, n_probe=4).collect()
    brute = cosine_topk(corpus, qvec, 10).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in brute]
    probed = ivf_topk(corpus, cents, qvec, k=10, n_probe=2).collect()
    assert len(probed) == 10
    brute_cos = {r["vec_id"]: r["cosine"] for r in brute}
    # every probed hit that also appears in the exhaustive list agrees
    for r in probed:
        if r["vec_id"] in brute_cos:
            assert abs(r["cosine"] - brute_cos[r["vec_id"]]) < 1e-6


def test_kmeans_empty_input_raises(spark):
    import pytest

    from qwery_spark.operators.kmeans import kmeans_fit

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fit(empty, k=4, iters=1)


def test_kmeans_fewer_rows_than_k_warns_and_reduces(spark):
    import pytest

    from qwery_spark.operators.kmeans import kmeans_fit

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.warns(UserWarning, match="rows < k"):
        cents, dist = kmeans_fit(df, k=5, iters=1)
    assert len(cents) == 2
