"""Round-3 adversarial-sweep regressions: SQL null-aggregation parity
(SUM of all-NULL = NULL, positional OHLC open/close) and ASCII-class
tokenization parity with DuckDB's RE2 on non-ASCII / exotic-whitespace
text — each pinned against a DuckDB micro-oracle on in-memory data the
sf corpora happen not to contain (they are null-free and ASCII-only)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data


def _ts(hours):
    return pd.Timestamp("2024-01-01") + pd.to_timedelta(hours, unit="h")


def test_hash_groupby_sum_all_null_group_is_null(ray_session):
    # SQL SUM ignores NULLs and returns NULL (not 0.0) for an all-NULL
    # group; a plain pandas .sum() partial would resurrect it as 0.0
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 4 + ["c"] * 4,
        "v": [1.0, 2.0, np.nan, 3.0] + [np.nan] * 4 + [np.nan, np.nan, -1.0, 1.0],
    })
    got = (
        hash_groupby_aggregate(
            ray.data.from_pandas(df).repartition(5), ["k"],
            {"s": ("v", "sum"), "n": ("v", "count"), "m": ("v", "mean")},
            num_buckets=4,
        )
        .to_pandas().set_index("k").sort_index()
    )
    ora = duckdb.sql(
        "SELECT k, SUM(v) AS s, COUNT(v) AS n, AVG(v) AS m FROM df GROUP BY k ORDER BY k"
    ).df().set_index("k")
    pd.testing.assert_frame_equal(got[["s", "n", "m"]], ora, check_dtype=False)
    assert np.isnan(got.loc["b", "s"]) and got.loc["b", "n"] == 0


def test_session_stats_all_null_session_sum_is_null(ray_session):
    from temporalscope_ray.stages.window_features import session_stats

    # two sessions per user: first all-null values, second mixed
    df = pd.DataFrame({
        "user_id": [1] * 6,
        "event_id": np.arange(6),
        "ts": list(_ts([0, 0.1, 0.2])) + list(_ts([5, 5.1, 5.2])),
        "value": [np.nan, np.nan, np.nan, 1.5, np.nan, 2.5],
    })
    out = session_stats(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts",
        gap=pd.Timedelta("30min"), value_col="value",
    ).to_pandas().sort_values("session_id").reset_index(drop=True)
    assert np.isnan(out.loc[0, "value_sum"])  # SQL SUM(all NULL) = NULL
    assert out.loc[1, "value_sum"] == pytest.approx(4.0)
    assert out["n_events"].tolist() == [3, 3]


def test_trailing_global_sum_all_null_window_is_null(ray_session):
    from temporalscope_ray.stages.agg import trailing_global_aggregate

    # isolated events 1h apart: each window holds only its own row, so a
    # null-valued row's w_sum must be NULL while its w_count stays 1
    df = pd.DataFrame({
        "event_id": np.arange(4),
        "ts": _ts([0, 1, 2, 3]),
        "value": [1.0, np.nan, 3.0, np.nan],
    })
    out = (
        trailing_global_aggregate(
            ray.data.from_pandas(df).repartition(2), "ts",
            window_us=600_000_000, value_col="value",
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["w_count"].tolist() == [1, 1, 1, 1]
    assert out.loc[0, "w_sum"] == 1.0 and out.loc[2, "w_sum"] == 3.0
    assert np.isnan(out.loc[1, "w_sum"]) and np.isnan(out.loc[3, "w_sum"])


def test_volume_bars_positional_open_close_under_nulls(ray_session):
    # SQL's row_number() picks the first/last ROW's raw value (possibly
    # NULL); pandas groupby first/last skip NaN and substituted the
    # first non-null — caught by the adversarial sweep
    from temporalscope_ray.stages.agg import volume_bars

    df = pd.DataFrame({
        "user_id": [1] * 5,
        "event_id": np.arange(5),
        "ts": _ts([0, 1, 2, 3, 4]),
        "value": [np.nan, 4.0, np.nan, np.nan, np.nan],
    })
    out = (
        volume_bars(ray.data.from_pandas(df), "user_id", "ts", "value",
                    threshold=100.0, tiebreak=["event_id"])
        .to_pandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert np.isnan(r["open_v"]) and np.isnan(r["close_v"])  # positional
    assert r["high_v"] == 4.0 and r["low_v"] == 4.0  # skipna like MAX/MIN
    assert r["n"] == 5 and r["volume"] == pytest.approx(4.0)

    # all-null bar: high/low NULL like SQL MAX/MIN over empty
    df2 = df.assign(value=np.nan)
    r2 = volume_bars(ray.data.from_pandas(df2), "user_id", "ts", "value",
                     threshold=100.0, tiebreak=["event_id"]).to_pandas().iloc[0]
    assert np.isnan(r2["high_v"]) and np.isnan(r2["low_v"])
    assert r2["volume"] == 0.0 and r2["n"] == 5


ADV_TEXTS = [
    None, "", "\n\t  \r\n",
    "émojis 🎉 und ß-Umlaute, 日本語テキスト",
    "a\vb c",          # \v: NON-space in RE2 \s=[\t\n\f\r ]
    "x　y end",    # U+3000: NON-space in RE2, space in Python's \s
    "Mixed CASE with_under_score 42 and punct!?",
]


def test_ascii_token_class_matches_duckdb_re2(ray_session):
    # the engine-wide portable word class must extract the SAME tokens
    # as DuckDB regexp_extract_all(lower(text), '\w+') — RE2's \w is
    # ASCII-only while Python's is unicode-aware
    from temporalscope_ray.stages.text import top_terms

    docs = pd.DataFrame({"doc_id": range(len(ADV_TEXTS)), "text": ADV_TEXTS})
    got = top_terms(ray.data.from_pandas(docs), k=100).to_pandas()
    ora = duckdb.sql(r"""
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS term FROM docs)
        GROUP BY term ORDER BY cnt DESC, term LIMIT 100
    """).df()
    pd.testing.assert_frame_equal(
        got.sort_values(["cnt", "term"], ascending=[False, True]).reset_index(drop=True),
        ora, check_dtype=False)


def test_text_stats_whitespace_class_matches_duckdb(ray_session):
    from temporalscope_ray.stages.text import add_text_stats

    docs = pd.DataFrame({"doc_id": range(len(ADV_TEXTS)), "text": ADV_TEXTS})
    got = (
        add_text_stats(ray.data.from_pandas(docs), concurrency=1)
        .to_pandas()[["doc_id", "n_chars_calc", "n_tokens", "n_words"]]
        .sort_values("doc_id").reset_index(drop=True)
    )
    ora = duckdb.sql(r"""
        SELECT doc_id,
               LENGTH(COALESCE(text,'')) AS n_chars_calc,
               LENGTH(regexp_extract_all(COALESCE(text,''), '\S+')) AS n_tokens,
               LENGTH(regexp_extract_all(COALESCE(text,''), '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_words
        FROM docs ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)


def test_fingerprint_normalization_matches_duckdb_on_exotic_ws(ray_session):
    from temporalscope_ray.stages.text import Fingerprint

    docs = pd.DataFrame({"doc_id": range(len(ADV_TEXTS)), "text": ADV_TEXTS})
    eng = (
        ray.data.from_pandas(docs)
        .map_batches(Fingerprint(portable=True), batch_format="pandas")
        .to_pandas().sort_values("doc_id")
    )
    u = eng["fingerprint"].to_numpy(np.int64).view(np.uint64)
    got = (u % np.uint64(1_000_000_007)).astype(np.int64)
    ora = duckdb.sql(r"""
        SELECT CAST(md5_number_lower(
                 trim(regexp_replace(lower(COALESCE(text,'')), '\s+', ' ', 'g')))
               % 1000000007 AS BIGINT) AS fp
        FROM docs ORDER BY doc_id
    """).df()["fp"].to_numpy()
    np.testing.assert_array_equal(got, ora)


def test_knn_tie_safe_and_zero_vector_contract(ray_session):
    # ten exact copies of the query direction tie at cos=1.0: top-k must
    # keep the SMALLEST ids among the tied set (SQL ORDER BY cos DESC,
    # id), regardless of block/argpartition layout; the zero vector
    # (failed encode) must never appear as a neighbor
    from temporalscope_ray.stages.similarity import knn_brute

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 8))
    q = rng.standard_normal(8)
    dup_ids = [5, 9, 13, 17, 21, 25, 29, 33, 37, 39]
    for i in dup_ids:
        base[i] = q  # bit-identical copies → exact cosine ties
    base[2] = 0.0  # zero vector
    df = pd.DataFrame({"vec_id": np.arange(40),
                       "embedding": [r.astype(np.float32) for r in base]})
    out = knn_brute(ray.data.from_pandas(df).repartition(6), q[None, :],
                    k=5, batch_size=8, concurrency=2)
    assert out["vec_id"].tolist() == sorted(dup_ids)[:5]
    assert 2 not in set(out["vec_id"])
    assert np.allclose(out["cos_sim"], 1.0)


def test_empty_table_framework_contract(ray_session, tmp_path):
    # Pin the Ray behavior the empty-table policy rests on: a 0-row
    # parquet read is schema-less after execution (empty blocks are
    # dropped), and the engine's driver-frame operators return SQL-
    # consistent EMPTY results instead of NaN-padded rows
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"value": pa.array([], type=pa.float64())}), p)
    ds = ray.data.read_parquet(p)
    assert ds.map_batches(lambda t: t, batch_format="pyarrow").schema() is None

    from temporalscope_ray.stages.stats import (
        approx_quantile_hist,
        exact_quantiles,
        median_absolute_deviation,
    )

    assert len(exact_quantiles(ds, "value", [0.5, 0.9])) == 0
    assert len(median_absolute_deviation(ds, "value")) == 0
    assert len(approx_quantile_hist(ds, "value", [0.5])) == 0
