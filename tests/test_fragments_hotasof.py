"""Fragment-aware reads, fragment lineage records, hot-entity as-of."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from temporalscope_ray.sources.fragments import FRAGMENT_COL, ROW_START_COL, list_fragments, read_parquet_fragments
from temporalscope_ray.stages.asof import asof_join
from temporalscope_ray.state import lineage


def write_fragments(tmp_path, nfiles=3, rows=40):
    import pyarrow as pa

    paths = []
    for i in range(nfiles):
        df = pd.DataFrame(
            {"user_id": np.arange(rows) % 5, "ts": np.arange(rows) + i * 1000.0, "value": np.arange(rows) * 1.0}
        )
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        paths.append(p)
    return paths


def test_read_parquet_fragments(tmp_path):
    paths = write_fragments(tmp_path)
    frags = list_fragments(paths)
    assert len(frags) == 3 and all(f["num_rows"] == 40 for f in frags)
    ds = read_parquet_fragments(paths, columns=["user_id", "ts"])
    df = ds.to_pandas()
    assert len(df) == 120
    assert set(df.columns) == {"user_id", "ts", FRAGMENT_COL, ROW_START_COL}
    g = df.groupby(FRAGMENT_COL)[ROW_START_COL]
    assert (g.min() == 0).all() and (g.max() == 39).all()


def test_lineage_records_input_fragments(tmp_path):
    paths = write_fragments(tmp_path)
    out = str(tmp_path / "out")
    ds = read_parquet_fragments(paths)
    lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=4, time_col="ts")
    recs = lineage.completed_buckets(out)
    rec = next(iter(recs.values()))
    assert "input_fragments" in rec
    frag_ids = {f["fragment_id"] for f in rec["input_fragments"]}
    assert frag_ids <= {0, 1, 2} and len(frag_ids) == 3  # every bucket draws from all files
    for f in rec["input_fragments"]:
        assert 0 <= f["row_min"] <= f["row_max"] <= 39
    # lineage cols dropped from the written output
    back = lineage.read_partitioned(out).to_pandas()
    assert FRAGMENT_COL not in back.columns and ROW_START_COL not in back.columns


def test_asof_hot_entity_salting_matches_oracle():
    rng = np.random.default_rng(3)
    # entity 999 is hot on the left (80% of rows)
    n = 400
    users = np.where(rng.random(n) < 0.8, 999, rng.integers(0, 5, n))
    left = pd.DataFrame({"user_id": users, "ts": rng.uniform(0, 1000, n), "lval": rng.normal(size=n)})
    left = left.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    right = pd.DataFrame(
        {"user_id": np.concatenate([np.full(50, 999), rng.integers(0, 5, 30)]),
         "ts": rng.uniform(0, 1000, 80), "state": rng.normal(size=80)}
    ).drop_duplicates(["user_id", "ts"]).reset_index(drop=True)

    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
        broadcast=False, num_buckets=8, hot_entities=[999], num_salts=4,
    ).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"), on="ts", by="user_id",
                        direction="backward")
    key = ["user_id", "ts"]
    out = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(out) == len(exp)
    a, b = out["state"], exp["state"]
    assert ((a.isna() & b.isna()) | (a == b)).all()


def test_read_lance_or_fragments_fallback(tmp_path, ray_session):
    # lance is absent in this container: the gate must fall back to the
    # fragment-aware parquet reader with identical provenance columns
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from temporalscope_ray.sources.fragments import read_lance_or_fragments

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": list(range(7))}), p)
    out = read_lance_or_fragments(p, columns=["a"]).to_pandas()
    assert sorted(out.columns) == ["__fragment_id__", "__row_start__", "a"]
    assert out["__row_start__"].tolist() == list(range(7))
    assert (out["__fragment_id__"] == 0).all()
