"""Unit tests for the cross-corpus contamination probe."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.dedup import contaminated_ids


def _corpora():
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": [0, 2, 4, 6],
        "text": [
            "the quick brown fox jumps over the lazy dog",   # shares 5-gram with ref
            "completely unrelated text about distributed engines here",
            "short",                                          # < k tokens: whole-doc shingle
            None,                                             # null text: no shingles
        ],
    }))
    reference = ray.data.from_arrow(pa.table({
        "doc_id": [1, 3],
        "text": [
            "see the quick brown fox jumps over a fence",     # shares the 5-gram
            "short",                                          # whole-doc match for doc 4
        ],
    }))
    return corpus, reference


@pytest.mark.parametrize("portable", [False, True])
def test_contamination_detects_shared_shingles(ray_session, portable):
    corpus, reference = _corpora()
    out = contaminated_ids(corpus, reference, portable=portable, shingle_k=5,
                           num_buckets=4).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]


def test_contamination_empty_reference(ray_session):
    corpus, _ = _corpora()
    empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64()),
                                          "text": pa.array([], type=pa.string())}))
    out = contaminated_ids(corpus, empty, num_buckets=4).to_pandas()
    assert len(out) == 0


def test_contamination_rate_graded(ray_session):
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.dedup import contamination_rate

    ref = pd.DataFrame({"doc_id": [100],
                        "text": ["alpha beta gamma delta epsilon zeta eta"]})
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # verbatim copy -> rate 1.0
            "alpha beta gamma delta epsilon zeta eta",
            # shares exactly one 5-shingle (alpha..epsilon) then diverges
            "alpha beta gamma delta epsilon nine ten eleven twelve",
            # disjoint -> 0.0
            "one two three four five six seven",
        ],
    })
    out = contamination_rate(
        ray.data.from_pandas(corpus).repartition(2),
        ray.data.from_pandas(ref), portable=True, shingle_k=5,
    ).to_pandas().set_index("doc_id")
    assert out.loc[1, "contamination_rate"] == 1.0
    assert 0.0 < out.loc[2, "contamination_rate"] < 0.5
    assert out.loc[3, "contamination_rate"] == 0.0
    assert out.loc[1, "n_shingles"] == 3  # 7 tokens -> 3 distinct 5-shingles


def test_source_overlap_exact_jaccard(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.dedup import source_overlap

    # A and B share one 5-token shingle set exactly (copied doc);
    # C is disjoint from both → no (A,C)/(B,C) rows.
    shared = "alpha beta gamma delta epsilon"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["A", "A", "B", "C"],
        "text": [shared, "one two three four five six",
                 shared, "seven eight nine ten eleven"],
    })
    out = source_overlap(ray.data.from_pandas(df).repartition(3),
                         shingle_k=5, num_buckets=4).to_pandas()
    assert set(zip(out["source_a"], out["source_b"])) == {("A", "B")}
    r = out.iloc[0]
    # A has 3 distinct shingles (1 from the shared doc, 2 from the 6-token
    # doc), B has 1, common = 1 → jaccard = 1/3
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 1, 1)
    assert np.isclose(r["jaccard"], round(1 / 3, 6))
