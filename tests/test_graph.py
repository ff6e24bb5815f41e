"""Unit tests for connected-components duplicate clustering."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.graph import connected_components


def test_chain_triangle_and_isolated_pair(ray_session):
    pairs = ray.data.from_arrow(
        pa.table({"id_a": [2, 3, 10, 21, 22, 22], "id_b": [1, 2, 11, 20, 21, 20]})
    )
    out = connected_components(pairs, num_buckets=4).to_pandas()
    got = dict(zip(out["id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(ray_session):
    # a 40-vertex path (diameter 39): pointer jumping must converge in
    # ~log2(39)+2 rounds, far under the default max_iters
    n = 40
    pairs = ray.data.from_arrow(
        pa.table({"id_a": list(range(1, n)), "id_b": list(range(n - 1))})
    )
    out = connected_components(pairs, num_buckets=4, max_iters=10).to_pandas()
    assert (out["cluster_id"] == 0).all()
    assert len(out) == n


def test_max_iters_fails_loud(ray_session):
    n = 30
    pairs = ray.data.from_arrow(
        pa.table({"id_a": list(range(1, n)), "id_b": list(range(n - 1))})
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        # force the distributed rounds (driver path has no max_iters)
        connected_components(pairs, num_buckets=2, max_iters=2,
                             driver_edge_limit=0)


def test_hamming_pairs_vs_bruteforce():
    from temporalscope_ray.stages.dedup import hamming_pairs
    import itertools

    rng = np.random.default_rng(3)
    n = 300
    # clustered hashes: 30 bases, members perturbed in <=3 low bits
    bases = rng.integers(0, 2**63, 30, dtype=np.int64)
    h = bases[rng.integers(0, 30, n)] ^ rng.integers(0, 8, n).astype(np.int64)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "h": h})
    out = hamming_pairs(ray.data.from_pandas(df).repartition(4),
                        hash_col="h", id_col="id", threshold=3,
                        num_buckets=8).to_pandas().drop_duplicates()
    got = set(zip(out["id_a"], out["id_b"]))
    hu = h.astype(np.int64).view(np.uint64)
    exp = {(a, b) for a, b in itertools.combinations(range(n), 2)
           if bin(int(hu[a] ^ hu[b])).count("1") <= 3}
    assert got == exp


def test_jaccard_pairs_transitive_cluster():
    from temporalscope_ray.stages.dedup import jaccard_pairs
    from temporalscope_ray.stages.graph import connected_components

    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the green field chasing butterflies all afternoon long today")
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 10],
        "text": [
            base,
            base.replace("afternoon", "evening"),           # near-dup of 0
            base.replace("afternoon", "evening")
                .replace("butterflies", "fireflies"),        # near-dup of 1
            "completely different content about distributed systems and "
            "ray data pipelines processing parquet tables at scale",
        ],
    })
    pairs = jaccard_pairs(ray.data.from_pandas(docs), text_col="text",
                          id_col="doc_id", threshold=0.5, concurrency=1)
    labels = connected_components(pairs, num_buckets=4).to_pandas()
    lab = labels.set_index("id")["cluster_id"]
    # the 0-1-2 chain collapses to one cluster labeled by its min id
    assert lab[0] == lab[1] == lab[2] == 0
    assert 10 not in lab.index  # isolated doc never enters the graph


def test_driver_cc_matches_distributed(ray_session):
    import numpy as np

    rng = np.random.default_rng(6)
    # random forest of chains + stars
    a = rng.integers(0, 400, 300)
    b = rng.integers(0, 400, 300)
    pairs = ray.data.from_arrow(pa.table({"id_a": a.astype("int64"),
                                          "id_b": b.astype("int64")}))
    fast = connected_components(pairs).to_pandas().sort_values("id").reset_index(drop=True)
    slow = connected_components(pairs, driver_edge_limit=0) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert fast.equals(slow)


def test_removal_effect_hand_journey(ray_session):
    """Two-channel hand case: 'ad' journeys always convert, 'organic'
    never does — removing ad must kill all conversion (effect 1.0),
    removing organic must not change it (effect 0.0)."""
    import pandas as pd

    from temporalscope_ray.stages.graph import removal_effect_attribution

    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for u in range(10):  # ad -> purchase
        rows += [(u, t0, "ad"), (u, t0 + pd.Timedelta("1min"), "purchase")]
    for u in range(10, 20):  # organic -> organic (never converts)
        rows += [(u, t0, "organic"), (u, t0 + pd.Timedelta("1min"), "organic")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = range(len(df))
    out = removal_effect_attribution(
        ray.data.from_pandas(df).repartition(4), id_col="user_id",
        time_col="ts", type_col="event_type", conv_type="purchase",
        tiebreak=["event_id"], iters=12).set_index("channel")
    assert out.loc["ad", "removal_effect"] == 1.0
    assert out.loc["organic", "removal_effect"] == 0.0


def test_removal_effect_no_conversions_is_null(ray_session):
    import pandas as pd

    from temporalscope_ray.stages.graph import removal_effect_attribution

    df = pd.DataFrame({"user_id": [1, 1, 2], "event_type": ["a", "b", "a"],
                       "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
                       "event_id": [0, 1, 2]})
    out = removal_effect_attribution(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts",
        type_col="event_type", conv_type="purchase", tiebreak=["event_id"])
    # channels exist, but base conversion is 0 -> null effects
    assert set(out["channel"]) == {"a", "b"}
    assert out["removal_effect"].isna().all()


def test_pagerank_uniform_on_symmetric_cycle(ray_session):
    """a->b->a with equal counts: stationary mass must split evenly."""
    import pandas as pd

    from temporalscope_ray.stages.graph import pagerank_types

    df = pd.DataFrame({
        "user_id": [1] * 6,
        "event_type": ["a", "b"] * 3,
        "ts": pd.date_range("2024-01-01", periods=6, freq="1min"),
        "event_id": range(6),
    })
    out = pagerank_types(ray.data.from_pandas(df), id_col="user_id",
                         time_col="ts", type_col="event_type",
                         tiebreak=["event_id"]).set_index("node")
    assert abs(out.loc["a", "pagerank"] - 0.5) < 1e-6
    assert abs(out.loc["b", "pagerank"] - 0.5) < 1e-6
