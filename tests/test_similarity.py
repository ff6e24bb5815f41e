

def test_ivf_index_reuse_two_query_batches(ray_session):
    """Build once, query twice: results equal the one-shot knn_ivf for
    the same params, the assignments are materialized (queries replay
    nothing), and a second query batch works against the same index."""
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.similarity import (
        build_ivf_index, knn_ivf, query_ivf_index)

    rng = np.random.default_rng(3)
    n, dim = 600, 8
    mat = rng.standard_normal((n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    ds = ray.data.from_pandas(df).repartition(4)
    q1 = mat[:4] + 0.01
    q2 = mat[100:103] + 0.01

    index = build_ivf_index(ds, nlist=8, seed=17, concurrency=2)
    from ray.data.dataset import MaterializedDataset
    assert isinstance(index.assignments, MaterializedDataset)

    a = query_ivf_index(index, q1, k=5, nprobe=3)
    b = knn_ivf(ds, q1, k=5, nlist=8, nprobe=3, seed=17, concurrency=2)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))

    c = query_ivf_index(index, q2, k=5, nprobe=3)
    assert set(c["query_idx"]) == {0, 1, 2}
    # self-vector is its own nearest neighbour for a tiny perturbation
    top = c.sort_values(["query_idx", "cos_sim"], ascending=[True, False]) \
        .groupby("query_idx").head(1)
    assert list(top["vec_id"]) == [100, 101, 102]
