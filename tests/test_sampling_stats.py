"""Deterministic splits/sampling + normalization/quantiles/vocabulary."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.stages import sampling, stats
from temporalscope_ray.stages.text import top_terms


def _docs(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "fr", "de"], n, p=[0.6, 0.2, 0.2]),
    })


def test_split_deterministic_across_parallelism():
    """The same key lands in the same split regardless of block layout
    (the property that makes the split valid on any cluster size)."""
    df = _docs()
    a = sampling.with_split_column(ray.data.from_pandas(df).repartition(2), "doc_id").to_pandas()
    b = sampling.with_split_column(ray.data.from_pandas(df).repartition(13), "doc_id").to_pandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # fractions roughly honored (md5 is uniform)
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05 and abs(frac["val"] - 0.1) < 0.03


def test_hash_split_partitions_are_disjoint_and_complete():
    df = _docs(500)
    splits = sampling.hash_split(ray.data.from_pandas(df), "doc_id",
                                 {"train": 0.7, "test": 0.3})
    parts = {k: set(v.to_pandas()["doc_id"]) for k, v in splits.items()}
    assert parts["train"] | parts["test"] == set(df["doc_id"])
    assert not (parts["train"] & parts["test"])


def test_split_salt_changes_assignment():
    df = _docs(500)
    a = sampling.with_split_column(ray.data.from_pandas(df), "doc_id").to_pandas()
    b = sampling.with_split_column(ray.data.from_pandas(df), "doc_id", salt="v2").to_pandas()
    assert (a.sort_values("doc_id")["split"].to_numpy()
            != b.sort_values("doc_id")["split"].to_numpy()).any()


def test_split_nonportable_matches_fraction_contract():
    df = _docs(2000)
    out = sampling.with_split_column(ray.data.from_pandas(df).repartition(4), "doc_id",
                                     portable=False).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05


def test_stratified_sample_rates():
    df = _docs(6000)
    out = sampling.stratified_sample(
        ray.data.from_pandas(df).repartition(5), "doc_id", strata_col="lang",
        rates={"en": 0.25, "fr": 1.0}, default_rate=0.5,
    ).to_pandas()
    base = df["lang"].value_counts()
    kept = out["lang"].value_counts()
    assert abs(kept["en"] / base["en"] - 0.25) < 0.05
    assert kept["fr"] == base["fr"]
    assert abs(kept["de"] / base["de"] - 0.5) < 0.07
    # deterministic: rerun keeps the identical row set
    out2 = sampling.stratified_sample(
        ray.data.from_pandas(df).repartition(2), "doc_id", strata_col="lang",
        rates={"en": 0.25, "fr": 1.0}, default_rate=0.5,
    ).to_pandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])


def test_stratified_sample_rejects_bad_rate():
    ds = ray.data.from_pandas(_docs(10))
    with pytest.raises(ValueError, match="rates must be in"):
        sampling.stratified_sample(ds, "doc_id", strata_col="lang", rates={"en": 1.5})


def test_zscore_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "uid": rng.integers(0, 40, 4000),
        "v": rng.normal(50, 9, 4000),
    })
    df.loc[rng.integers(0, 4000, 100), "v"] = np.nan
    got = stats.zscore_per_entity(
        ray.data.from_pandas(df).repartition(7), "uid", "v", num_buckets=4
    ).to_pandas().sort_values(["uid", "v"]).reset_index(drop=True)
    g = df.groupby("uid")["v"]
    exp = (df["v"] - df["uid"].map(g.mean())) / df["uid"].map(g.std(ddof=0))
    exp_df = df.assign(v_z=exp).sort_values(["uid", "v"]).reset_index(drop=True)
    np.testing.assert_allclose(got["v_z"].to_numpy(), exp_df["v_z"].to_numpy(),
                               rtol=1e-9, atol=1e-9, equal_nan=True)


def test_zscore_train_fit_applied_to_test():
    """Leakage-safe form: stats fitted on one split standardize another."""
    df = pd.DataFrame({"uid": [1] * 6, "v": [1.0, 2, 3, 4, 5, 6]})
    train = ray.data.from_pandas(df.iloc[:4])
    fit = stats.entity_stats(train, "uid", "v").to_pandas()
    test = ray.data.from_pandas(df.iloc[4:])
    got = stats.zscore_per_entity(test, "uid", "v", stats=fit).to_pandas()
    m, s = 2.5, np.std([1.0, 2, 3, 4])
    np.testing.assert_allclose(got["v_z"].to_numpy(), (np.array([5.0, 6]) - m) / s)


def test_zscore_constant_entity_is_nan():
    df = pd.DataFrame({"uid": [1, 1, 2, 2], "v": [3.0, 3.0, 1.0, 2.0]})
    got = stats.zscore_per_entity(ray.data.from_pandas(df), "uid", "v").to_pandas()
    assert got.loc[got["uid"] == 1, "v_z"].isna().all()
    assert got.loc[got["uid"] == 2, "v_z"].notna().all()


def test_exact_quantiles_match_numpy():
    rng = np.random.default_rng(5)
    vals = rng.normal(size=3001)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(6)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = stats.exact_quantiles(ds, "x", qs)
    srt = np.sort(vals)
    exp = [srt[int(np.floor(q * (len(vals) - 1)))] for q in qs]
    np.testing.assert_allclose(got["value"].to_numpy(), exp, rtol=0, atol=0)


def test_exact_quantiles_validates_range():
    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0]}))
    with pytest.raises(ValueError, match="quantiles must be in"):
        stats.exact_quantiles(ds, "x", [1.5])


def test_top_terms_matches_counter():
    df = pd.DataFrame({"text": [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "a cat and a dog",
    ]})
    got = top_terms(ray.data.from_pandas(df).repartition(3), "text", k=3).to_pandas()
    exp = (pd.Series(" ".join(df["text"]).lower().split()).value_counts()
           .rename_axis("term").reset_index(name="cnt"))
    exp = exp.sort_values(["cnt", "term"], ascending=[False, True]).head(3).reset_index(drop=True)
    assert list(got["term"]) == list(exp["term"])
    assert list(got["cnt"]) == list(exp["cnt"])


def test_group_top_k_matches_pandas():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "uid": rng.integers(0, 30, 3000),
        "eid": np.arange(3000, dtype=np.int64),
        "v": rng.normal(size=3000),
    })
    df.loc[rng.integers(0, 3000, 60), "v"] = np.nan
    from temporalscope_ray.stages.grouped import group_top_k

    got = group_top_k(ray.data.from_pandas(df).repartition(9), "uid", "v",
                      k=3, tiebreak=["eid"], num_buckets=4).to_pandas()
    exp = (df.sort_values(["uid", "v", "eid"], ascending=[True, False, True],
                          na_position="last")
           .groupby("uid", sort=False).head(3))
    key = ["uid", "eid"]
    assert (got.sort_values(key)[key].to_numpy()
            == exp.sort_values(key)[key].to_numpy()).all()


def test_group_top_k_hot_group_bounded_exchange():
    """One group holding 90% of rows still returns exactly k rows for
    it (the combiner caps what the exchange moves to k per block)."""
    n = 5000
    df = pd.DataFrame({
        "uid": np.where(np.arange(n) % 10 < 9, 0, np.arange(n) % 7 + 1),
        "eid": np.arange(n, dtype=np.int64),
        "v": np.arange(n, dtype=np.float64),
    })
    from temporalscope_ray.stages.grouped import group_top_k

    got = group_top_k(ray.data.from_pandas(df).repartition(16), "uid", "v",
                      k=5, tiebreak=["eid"]).to_pandas()
    hot = got[got["uid"] == 0]
    assert len(hot) == 5
    exp_hot = df[df["uid"] == 0].nlargest(5, "v")["eid"]
    assert set(hot["eid"]) == set(exp_hot)


def test_interpolate_linear_matches_manual():
    from temporalscope_ray.stages.window_features import interpolate_linear

    ts = pd.to_datetime(["2023-01-01 00:00", "2023-01-01 00:10",
                         "2023-01-01 00:40", "2023-01-01 01:00",
                         "2023-01-01 00:00", "2023-01-01 00:30"])
    df = pd.DataFrame({
        "uid": [1, 1, 1, 1, 2, 2],
        "eid": np.arange(6, dtype=np.int64),
        "ts": ts,
        "v": [10.0, np.nan, np.nan, 40.0, np.nan, 5.0],
    })
    got = interpolate_linear(ray.data.from_pandas(df), id_col="uid", time_col="ts",
                             value_cols=["v"], tiebreak=["eid"]).to_pandas()
    got = got.sort_values("eid").reset_index(drop=True)
    # user 1: gaps at 10min and 40min between (0min, 10.0) and (60min, 40.0)
    np.testing.assert_allclose(got["v_interp"].to_numpy()[:4],
                               [10.0, 15.0, 30.0, 40.0])
    # user 2: leading null has no previous observation -> stays null
    assert np.isnan(got["v_interp"].to_numpy()[4])
    assert got["v_interp"].to_numpy()[5] == 5.0


def test_embedding_covariance_matches_numpy():
    from temporalscope_ray.stages.linalg import embedding_covariance

    rng = np.random.default_rng(9)
    x = rng.normal(size=(800, 6)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(x)})
    got = embedding_covariance(ray.data.from_pandas(df).repartition(5), "embedding")
    exp = np.cov(x.astype(np.float64).T, bias=True)
    for _, r in got.iterrows():
        assert abs(r["cov"] - exp[int(r["i"]), int(r["j"])]) < 1e-9


def test_pca_project_recovers_dominant_direction():
    from temporalscope_ray.stages.linalg import pca_project

    rng = np.random.default_rng(4)
    base = rng.normal(size=(1000, 1)) @ np.array([[3.0, 1.0, 0.2, 0.0]])
    noise = rng.normal(scale=0.05, size=(1000, 4))
    df = pd.DataFrame({"embedding": list((base + noise).astype(np.float32))})
    out = pca_project(ray.data.from_pandas(df).repartition(4), "embedding", k=1).to_pandas()
    y = np.stack(out["pca"].to_numpy())[:, 0]
    # the first PC carries ~all the variance of the planted direction
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    total_var = x.var(axis=0).sum()
    assert y.var() / total_var > 0.98


def test_tfidf_zero_for_empty_doc():
    from temporalscope_ray.stages.text import tfidf_score

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha beta beta", "", "alpha unique"]})
    got = tfidf_score(ray.data.from_pandas(df), "text", "doc_id").to_pandas()
    got = got.set_index("doc_id")["tfidf_sum"]
    assert got[2] == 0.0
    # 'unique' (df=1) outweighs 'alpha' (df=2) in doc 3
    assert got[3] > 0


def test_top_terms_and_tfidf_ignore_null_text():
    from temporalscope_ray.stages.text import tfidf_score, top_terms

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", None]})
    terms = top_terms(ray.data.from_pandas(df), "text", k=10).to_pandas()
    assert set(terms["term"]) == {"alpha", "beta"}  # no 'nan'/'none' token
    scores = tfidf_score(ray.data.from_pandas(df), "text", "doc_id").to_pandas()
    assert scores.set_index("doc_id")["tfidf_sum"][2] == 0.0


def test_group_top_k_keeps_null_group():
    from temporalscope_ray.stages.grouped import group_top_k

    df = pd.DataFrame({"uid": [1.0, 1.0, np.nan, np.nan, np.nan],
                       "eid": np.arange(5, dtype=np.int64),
                       "v": [5.0, 4.0, 3.0, 2.0, 1.0]})
    got = group_top_k(ray.data.from_pandas(df), "uid", "v", k=2, tiebreak=["eid"]).to_pandas()
    assert len(got[got["uid"].isna()]) == 2  # null key is a group, not dropped


def test_deterministic_shuffle_positions_parallelism_independent():
    """The permutation is a bijection onto [0, n) and identical at any
    block layout; a different salt draws a different permutation."""
    df = _docs(1200)
    a = sampling.deterministic_shuffle(
        ray.data.from_pandas(df).repartition(3), "doc_id", salt="e0", pos_col="pos"
    ).to_pandas()
    b = sampling.deterministic_shuffle(
        ray.data.from_pandas(df).repartition(11), "doc_id", salt="e0", pos_col="pos"
    ).to_pandas()
    assert sorted(a["pos"]) == list(range(len(df)))
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["pos_a"] == merged["pos_b"]).all()
    c = sampling.deterministic_shuffle(
        ray.data.from_pandas(df), "doc_id", salt="e1", pos_col="pos"
    ).to_pandas()
    m2 = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (m2["pos_a"] != m2["pos_c"]).any()


def test_deterministic_shuffle_matches_oracle_order():
    """portable=True replays DuckDB's row_number() OVER (ORDER BY
    md5_number_lower(key || salt), key) exactly."""
    import duckdb

    df = _docs(800)
    mine = sampling.deterministic_shuffle(
        ray.data.from_pandas(df).repartition(5), "doc_id", salt="s", pos_col="pos",
        portable=True,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = duckdb.sql("""
        SELECT doc_id,
               CAST(row_number() OVER (
                    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 's'),
                             doc_id) - 1 AS BIGINT) AS pos
        FROM df ORDER BY doc_id
    """).df()
    assert (mine["pos"].to_numpy() == oracle["pos"].to_numpy()).all()


def test_deterministic_shuffle_ordered_consumption():
    """pos_col=None returns rows IN shuffle order (plan-scoped
    preserve_order), matching the pos_col ranking."""
    df = _docs(600)
    ordered = sampling.deterministic_shuffle(
        ray.data.from_pandas(df).repartition(4), "doc_id", salt="e0"
    ).to_pandas()
    ranked = sampling.deterministic_shuffle(
        ray.data.from_pandas(df), "doc_id", salt="e0", pos_col="pos"
    ).to_pandas().sort_values("pos")
    assert list(ordered["doc_id"]) == list(ranked["doc_id"])


def test_sample_k_exact_size_and_parallelism_independent():
    df = _docs(1500)
    a = sampling.sample_k(ray.data.from_pandas(df).repartition(2), "doc_id",
                          k=64, salt="e", portable=True).to_pandas()
    b = sampling.sample_k(ray.data.from_pandas(df).repartition(17), "doc_id",
                          k=64, salt="e", portable=True).to_pandas()
    assert len(a) == 64 and set(a["doc_id"]) == set(b["doc_id"])
    # matches the SQL selection rule exactly
    import duckdb
    oracle = duckdb.sql("""
        SELECT doc_id FROM df
        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 'e') DESC, doc_id
        LIMIT 64
    """).df()
    assert set(a["doc_id"]) == set(oracle["doc_id"])


def test_normalize_text_matches_sql_rule():
    import duckdb
    from temporalscope_ray.stages.text import normalize_text

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["  Hello\t\tWORLD \n", "a\r\nb\fc\vd", None, "NoChange"],
    })
    mine = normalize_text(ray.data.from_pandas(df), "text", out_col="norm") \
        .to_pandas().sort_values("doc_id")
    oracle = duckdb.sql("""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[ \\t\\r\\n\\f\\v]+', ' ', 'g')) AS norm
        FROM df ORDER BY doc_id
    """).df()
    assert list(mine["norm"].fillna("<null>")) == list(oracle["norm"].fillna("<null>"))
    assert mine.loc[mine["doc_id"] == 1, "norm"].iloc[0] == "hello world"


def test_temperature_resample_rebalances_and_matches_sql():
    """alpha<1 shrinks the head stratum hardest; smallest stratum keeps
    rate 1.0; every per-row decision replays in SQL from SQL's own
    counts."""
    import duckdb

    df = _docs(4000, seed=7)  # en ~60%, fr/de ~20% each
    out = sampling.temperature_resample(
        ray.data.from_pandas(df).repartition(6), "doc_id", "lang",
        alpha=0.3, salt="t", portable=True,
    ).to_pandas()
    oracle = duckdb.sql("""
        WITH cnt AS (SELECT lang, COUNT(*)::DOUBLE AS c FROM df GROUP BY lang),
             w AS (SELECT lang, POWER(c / (SELECT SUM(c) FROM cnt), 0.3 - 1.0) AS w FROM cnt),
             r AS (SELECT lang, CAST(ROUND(w / (SELECT MAX(w) FROM w) * 1000000, 0) AS BIGINT) AS rate_int FROM w)
        SELECT d.doc_id FROM df d JOIN r USING (lang)
        WHERE CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR) || 't') % 1000000 AS BIGINT) < r.rate_int
    """).df()
    assert set(out["doc_id"]) == set(oracle["doc_id"])
    # head shrinks, tail survives whole
    before = df["lang"].value_counts()
    after = out["lang"].value_counts()
    smallest = before.idxmin()
    assert after[smallest] == before[smallest]            # rate 1.0 stratum
    assert after["en"] / before["en"] < after[smallest] / before[smallest]
    # post-sample shares are closer to uniform than before
    pre = (before / before.sum()).max()
    post = (after / after.sum()).max()
    assert post < pre


def test_frequency_encode_exact_counts():
    df = _docs(900)
    out = stats.frequency_encode(ray.data.from_pandas(df).repartition(5),
                                 "lang").to_pandas()
    vc = df["lang"].value_counts()
    assert (out["lang_freq"] == out["lang"].map(vc)).all()


def test_equal_width_bin_bounds_and_nulls():
    df = pd.DataFrame({"x": [0.0, 0.999, 1.0, 5.0, 9.999, 10.0, np.nan]})
    out = stats.equal_width_bin(ray.data.from_pandas(df).repartition(2),
                                "x", k=10).to_pandas().sort_values("x")
    got = out["x_bin"].tolist()
    assert got[:6] == [0, 0, 1, 5, 9, 9]   # max value clamps to k-1
    assert pd.isna(out.loc[out["x"].isna(), "x_bin"]).all()


def test_feature_cross_deterministic_and_bounded():
    df = pd.DataFrame({"a": ["x", "y", None], "b": [1, 2, 3]})
    out = stats.feature_cross(ray.data.from_pandas(df), ["a", "b"],
                              num_bins=100, out_col="c").to_pandas()
    assert out["c"].dropna().between(0, 99).all()
    assert pd.isna(out.loc[out["a"].isna(), "c"]).all()
    out2 = stats.feature_cross(ray.data.from_pandas(df).repartition(3),
                               ["a", "b"], num_bins=100, out_col="c").to_pandas()
    m = out.dropna().merge(out2.dropna(), on=["a", "b"])
    assert (m["c_x"] == m["c_y"]).all()


def test_minmax_scale_per_group_and_train_fit():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": np.repeat([1, 2, 3], 50),
        "v": np.concatenate([rng.normal(0, 1, 50), rng.normal(5, 2, 50),
                             np.full(50, 7.0)]),  # group 3 constant
    })
    out = stats.minmax_scale_per_group(
        ray.data.from_pandas(df).repartition(4), "g", "v").to_pandas()
    for g in (1, 2):
        sub = out[out["g"] == g]
        assert np.isclose(sub["v_mm"].min(), 0) and np.isclose(sub["v_mm"].max(), 1)
    assert out.loc[out["g"] == 3, "v_mm"].isna().all()  # constant group -> NaN
    # train-fit apply: scaling val data with train stats
    train_stats = pd.DataFrame({"g": [1], "__lo__": [0.0], "__hi__": [2.0]})
    val = pd.DataFrame({"g": [1, 1], "v": [1.0, 4.0]})
    applied = stats.minmax_scale_per_group(
        ray.data.from_pandas(val), "g", "v", stats=train_stats).to_pandas()
    assert list(applied["v_mm"]) == [0.5, 2.0]  # out-of-range extrapolates, not clipped


def test_population_stability_detects_drift():
    rng = np.random.default_rng(2)
    n = 4000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(n) * 60, unit="s")
    stable = pd.DataFrame({"ts": ts, "v": rng.normal(10, 2, n)})
    shifted = pd.DataFrame({"ts": ts, "v": np.concatenate([
        rng.normal(10, 2, n // 2), rng.normal(16, 2, n // 2)])})
    psi_stable = stats.population_stability(
        ray.data.from_pandas(stable).repartition(4), "v", "ts")["psi"].iloc[0]
    psi_shift = stats.population_stability(
        ray.data.from_pandas(shifted).repartition(4), "v", "ts")["psi"].iloc[0]
    assert psi_stable < 0.05          # same distribution: negligible PSI
    assert psi_shift > 0.5            # mean shift: strong drift signal
    # deterministic across block layouts
    psi2 = stats.population_stability(
        ray.data.from_pandas(shifted).repartition(13), "v", "ts")["psi"].iloc[0]
    assert psi2 == psi_shift


def test_group_mean_embedding_matches_numpy():
    from temporalscope_ray.stages.linalg import group_mean_embedding

    rng = np.random.default_rng(6)
    n, d = 600, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 3, n)
    df = pd.DataFrame({"label": lab, "embedding": list(emb)})
    out = group_mean_embedding(ray.data.from_pandas(df).repartition(4),
                               "label", round_to=None).to_pandas()
    for g in range(3):
        ref = emb[lab == g].astype(np.float64).mean(axis=0)
        got = out[out["label"] == g].sort_values("dim")["mean_val"].to_numpy()
        assert np.allclose(got, ref, atol=1e-9)


def test_top_keyword_prefers_distinctive_terms():
    from temporalscope_ray.stages.text import top_keyword

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the the the zebra",                 # tf(the)=3·ln(4/3) < 1·ln(4/1)
            "the quick the brown the fox",
            "the end",
            "",                                  # tokenless -> null keyword
        ],
    })
    out = top_keyword(ray.data.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert out.loc[1, "keyword"] == "zebra"      # idf beats raw frequency here
    assert out.loc[2, "keyword"] in {"quick", "brown", "fox"}
    assert pd.isna(out.loc[4, "keyword"]) and np.isnan(out.loc[4, "keyword_score"])


def test_bm25_matches_closed_form_and_parallelism_independent():
    from temporalscope_ray.stages.text import bm25_score

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["cat dog cat", "dog dog dog fish", "", "bird bird cat dog fish"],
    })
    got = bm25_score(ray.data.from_pandas(df), "text", "doc_id", ["cat", "fish"]) \
        .to_pandas().set_index("doc_id")["bm25"]

    # closed-form reference
    import math
    toks = [t.split() for t in df["text"]]
    n, dls = len(toks), [len(t) for t in toks]
    avgdl = sum(dls) / n
    k1, b = 1.2, 0.75

    def ref(d):
        s = 0.0
        for term in ["cat", "fish"]:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            dfreq = sum(term in t for t in toks)
            idf = math.log1p((n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        return s

    for i, doc in enumerate([1, 2, 3, 4]):
        assert got[doc] == pytest.approx(ref(i), abs=1e-12)
    assert got[3] == 0.0  # empty doc

    # bit-identical at different block layouts (fixed-order summation)
    got4 = bm25_score(ray.data.from_pandas(df).repartition(4), "text", "doc_id",
                      ["cat", "fish"]).to_pandas().set_index("doc_id")["bm25"]
    assert (got.sort_index() == got4.sort_index()).all()


def test_grouped_moments_matches_pandas_and_edge_rules(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import grouped_moments

    rng = np.random.default_rng(11)
    big = pd.DataFrame({
        "g": rng.integers(0, 4, 3000).astype(str),
        "v": rng.lognormal(1.0, 0.8, 3000),
    })
    got = grouped_moments(ray.data.from_pandas(big).repartition(5), "g", "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    ref = big.groupby("g")["v"].agg(
        n="count", skewness="skew", kurtosis=lambda s: s.kurt()).reset_index()
    for col in ("skewness", "kurtosis"):
        assert np.allclose(got[col], np.round(ref[col], 6), atol=1e-6)
    assert (got["n"] == ref["n"]).all()

    # NULL rules: n<3 -> no skew, n<4 -> no kurt, constant group -> both
    # null (exact min==max detection, not a variance threshold), nulls
    # in the value column are ignored like SQL aggregates.
    edge = pd.DataFrame({
        "g": [1, 1, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5],
        "v": [1., 2., 5., 5., 5., 1., 2., 3., 4., 7., 7., 7., 8., 1., None, 3.],
    })
    out = grouped_moments(ray.data.from_pandas(edge), "g", "v") \
        .to_pandas().sort_values("g").set_index("g")
    assert out.loc[1, "n"] == 2 and np.isnan(out.loc[1, "skewness"])
    assert np.isnan(out.loc[2, "skewness"])  # constant, despite n=3
    assert out.loc[3, "skewness"] == 0.0 and out.loc[3, "kurtosis"] == -1.2
    assert out.loc[4, "skewness"] == 2.0 and out.loc[4, "kurtosis"] == 4.0
    assert out.loc[5, "n"] == 2  # null ignored

    # block-layout determinism (rounded outputs identical at any split)
    got1 = grouped_moments(ray.data.from_pandas(big), "g", "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got1)


def test_winsorize_per_group_clips_to_group_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import winsorize_per_group

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 500).astype(str),
        "v": rng.normal(0, 10, 500),
    })
    df.loc[7, "v"] = np.nan
    out = winsorize_per_group(ray.data.from_pandas(df).repartition(4), "g", "v",
                              lower=0.1, upper=0.9).to_pandas()
    qs = df.groupby("g")["v"].quantile([0.1, 0.9]).unstack()
    lo = np.round(out["g"].map(qs[0.1]).to_numpy(np.float64), 6)
    hi = np.round(out["g"].map(qs[0.9]).to_numpy(np.float64), 6)
    v = out["v"].to_numpy()
    w = out["v_wins"].to_numpy()
    ok = ~np.isnan(v)
    assert np.allclose(w[ok], np.clip(v[ok], lo[ok], hi[ok]), atol=1e-6)
    assert np.isnan(w[~ok]).all()                     # nulls stay null
    inner = ok & (v >= lo) & (v <= hi)
    assert (w[inner] == v[inner]).all()               # unclipped rows bit-exact
    assert ((w <= hi) | ~ok).all() and ((w >= lo) | ~ok).all()


def test_pairwise_corr_matches_pandas_pairwise(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import pairwise_corr

    rng = np.random.default_rng(21)
    n = 2000
    y = rng.normal(5, 2, n)
    df = pd.DataFrame({
        "y": y,
        "f_pos": y * 2 + rng.normal(0, 1, n),     # strong positive
        "f_noise": rng.normal(0, 1, n),           # ~0
        "f_const": np.full(n, 3.0),               # constant -> NULL
        "f_holey": np.where(rng.random(n) < 0.2, np.nan, -y),  # pairwise mask
    })
    out = pairwise_corr(ray.data.from_pandas(df).repartition(6), "y",
                        ["f_pos", "f_noise", "f_const", "f_holey"]) \
        .to_pandas().set_index("feature")
    for f in ["f_pos", "f_noise"]:
        assert out.loc[f, "corr"] == pytest.approx(df["y"].corr(df[f]), abs=1e-6)
        assert out.loc[f, "n"] == n
    assert np.isnan(out.loc["f_const", "corr"])
    m = df["f_holey"].notna()
    assert out.loc["f_holey", "n"] == int(m.sum())
    assert out.loc["f_holey", "corr"] == pytest.approx(
        df.loc[m, "y"].corr(df.loc[m, "f_holey"]), abs=1e-6)


def test_mutual_information_separates_dependence(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import mutual_information

    rng = np.random.default_rng(5)
    n = 4000
    cats = rng.integers(0, 4, n)
    indep = pd.DataFrame({"c": cats.astype(str), "v": rng.normal(0, 1, n)})
    dep = pd.DataFrame({"c": cats.astype(str),
                        "v": cats * 10.0 + rng.normal(0, 0.1, n)})
    mi_i = mutual_information(ray.data.from_pandas(indep), "c", "v", bins=8)["mi"][0]
    mi_d = mutual_information(ray.data.from_pandas(dep), "c", "v", bins=8)["mi"][0]
    assert mi_i < 0.01                       # independent: near zero
    # deterministic category->bin mapping: MI == H(category)
    p = np.bincount(cats) / n
    h = -(p * np.log(p)).sum()
    assert mi_d == pytest.approx(h, abs=0.01)
    # block-layout determinism
    mi_d4 = mutual_information(ray.data.from_pandas(dep).repartition(7),
                               "c", "v", bins=8)["mi"][0]
    assert mi_d == mi_d4


def test_ks_drift_exact_vs_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import ks_drift

    rng = np.random.default_rng(9)
    n = 3000
    ts = pd.date_range("2024-01-01", periods=n, freq="min")
    cut_us = (ts[0].value // 1000 + ts[-1].value // 1000) // 2
    after = (ts.values.astype("datetime64[us]").astype(np.int64) > cut_us)
    v = np.where(after, rng.normal(1.0, 1.0, n), rng.normal(0.0, 1.0, n))
    # plant a few exact ties across both sides to exercise the tie rule
    v[0] = v[-1] = 0.5
    v[1] = v[2] = 0.5
    df = pd.DataFrame({"ts": ts, "value": v})
    out = ks_drift(ray.data.from_pandas(df).repartition(5), "value", "ts")

    # brute force on the driver: evaluate the CDF step AFTER each
    # distinct value's full tie group
    a = np.sort(v[~after]); b = np.sort(v[after])
    grid = np.unique(v)
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    want = np.abs(fa - fb).max()
    assert out["ks"][0] == pytest.approx(want, abs=1e-6)
    assert out["n_ref"][0] == len(a) and out["n_cur"][0] == len(b)

    # a planted mean shift scores far above a stable stream
    stable = pd.DataFrame({"ts": ts, "value": rng.normal(0, 1, n)})
    ks_stable = ks_drift(ray.data.from_pandas(stable), "value", "ts")["ks"][0]
    assert out["ks"][0] > 0.3 and ks_stable < 0.1


def test_impute_per_group_median_and_mean(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import impute_per_group

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3 + ["c"] * 2,
        "v": [1.0, 2.0, 3.0, np.nan, 100.0,   # a: median 2.5, mean 26.5
              7.0, np.nan, 9.0,               # b: median 8
              np.nan, np.nan],                # c: all null -> stays null
    })
    ds = ray.data.from_pandas(df).repartition(3)
    med = impute_per_group(ds, "g", "v", strategy="median").to_pandas()
    filled = med[med["v"].isna()].set_index("g")["v_imputed"]
    assert filled["a"] == 2.5 and filled["b"] == 8.0
    assert med[med["g"] == "c"]["v_imputed"].isna().all()
    ok = med["v"].notna()
    assert (med.loc[ok, "v_imputed"] == med.loc[ok, "v"]).all()  # passthrough exact

    mean = impute_per_group(ds, "g", "v", strategy="mean").to_pandas()
    assert mean[mean["v"].isna()].set_index("g")["v_imputed"]["a"] == 26.5


def test_grouped_ols_matches_polyfit_and_null_rules(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import grouped_ols

    rng = np.random.default_rng(17)
    n = 900
    g = rng.integers(0, 3, n).astype(str)
    x = rng.random(n) * 50
    y = 2.0 * x + rng.normal(0, 5, n)
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    # group 'z': single point; group 'c': constant x
    df = pd.concat([df, pd.DataFrame({"g": ["z", "c", "c"], "x": [1.0, 4.0, 4.0],
                                      "y": [9.0, 1.0, 2.0]})])
    out = grouped_ols(ray.data.from_pandas(df).repartition(4), "g", "x", "y") \
        .to_pandas().set_index("g")
    for gr, sub in df[df["g"].isin(list("012"))].groupby("g"):
        sl, ic = np.polyfit(sub["x"], sub["y"], 1)
        assert out.loc[gr, "slope"] == pytest.approx(sl, abs=1e-6)
        assert out.loc[gr, "intercept"] == pytest.approx(ic, abs=1e-6)
    assert np.isnan(out.loc["z", "slope"]) and np.isnan(out.loc["c", "slope"])
    assert np.isnan(out.loc["c", "intercept"])


def test_add_cume_dist_matches_rankdata(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import add_cume_dist

    rng = np.random.default_rng(23)
    v = np.round(rng.normal(0, 1, 400), 1)   # coarse -> many ties
    v[5] = np.nan
    df = pd.DataFrame({"i": np.arange(400), "v": v})
    out = add_cume_dist(ray.data.from_pandas(df).repartition(5), "v") \
        .to_pandas().sort_values("i").reset_index(drop=True)
    ok = ~np.isnan(v)
    vv = v[ok]
    want = np.array([ (vv <= x).sum() for x in vv ]) / len(vv)
    got = out["v_cume"].to_numpy()[ok]
    assert np.array_equal(got, want)          # bit-exact: same int counts
    assert np.isnan(out["v_cume"].to_numpy()[~ok]).all()


def test_approx_quantile_hist_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import approx_quantile_hist

    rng = np.random.default_rng(31)
    v = rng.lognormal(2.0, 1.0, 5000)
    v[10] = np.nan
    df = pd.DataFrame({"v": v})
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    est = approx_quantile_hist(ray.data.from_pandas(df).repartition(6), "v", qs,
                               bins=512)
    ok = v[~np.isnan(v)]
    width = (ok.max() - ok.min()) / 512
    for q, e in zip(qs, est["value"]):
        exact = np.quantile(ok, q, method="inverted_cdf")
        assert abs(e - exact) <= width + 1e-9, (q, e, exact)
    # estimates are monotone in q
    assert (np.diff(est["value"]) >= -1e-12).all()
    # block-layout determinism
    est2 = approx_quantile_hist(ray.data.from_pandas(df), "v", qs, bins=512)
    assert est["value"].tolist() == est2["value"].tolist()


def test_roc_auc_exact_vs_sklearn_free_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import roc_auc

    rng = np.random.default_rng(41)
    n = 2000
    y = rng.integers(0, 2, n)
    # informative score with heavy ties (1dp rounding)
    s = np.round(y * 1.0 + rng.normal(0, 1.2, n), 1)
    s[3] = np.nan
    df = pd.DataFrame({"s": s, "y": y})
    got = roc_auc(ray.data.from_pandas(df).repartition(5), "s", "y").iloc[0]

    ok = ~np.isnan(s)
    sv, yv = s[ok], y[ok]
    # reference: average-rank Mann-Whitney
    order = np.argsort(sv, kind="mergesort")
    ranks = np.empty(len(sv))
    sorted_s = sv[order]
    i = 0
    r = np.arange(1, len(sv) + 1, dtype=np.float64)
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i:j + 1]] = r[i:j + 1].mean()
        i = j + 1
    n_pos = int(yv.sum()); n_neg = int((1 - yv).sum())
    want = (ranks[yv == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert got["auc"] == pytest.approx(want, abs=1e-6)
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert 0.6 < got["auc"] < 0.9          # genuinely informative score

    # single-class input -> NaN
    one = roc_auc(ray.data.from_pandas(pd.DataFrame({"s": [1.0, 2.0], "y": [1, 1]})),
                  "s", "y").iloc[0]
    assert np.isnan(one["auc"])

    # block-layout determinism (bit-exact half-integer contract)
    got2 = roc_auc(ray.data.from_pandas(df), "s", "y").iloc[0]
    assert got["auc"] == got2["auc"]


def test_grouped_quantile_hist_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import grouped_quantile_hist

    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "v": rng.lognormal(1.0, 0.7, 3000),
    })
    df.loc[4, "v"] = np.nan
    df = pd.concat([df, pd.DataFrame({"g": ["const"] * 5, "v": [7.0] * 5})])
    out = grouped_quantile_hist(ray.data.from_pandas(df).repartition(4),
                                "g", "v", [0.5, 0.9], bins=128) \
        .to_pandas().set_index(["g", "q"])["value"]
    for g, sub in df.dropna(subset=["v"]).groupby("g"):
        vv = sub["v"].to_numpy()
        width = (vv.max() - vv.min()) / 128
        for q in (0.5, 0.9):
            exact = np.quantile(vv, q, method="inverted_cdf")
            assert abs(out[(g, q)] - exact) <= width + 1e-9, (g, q)
    assert out[("const", 0.5)] == 7.0        # constant group -> its constant


def test_importance_sample_rate_and_determinism(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.sampling import importance_sample

    rng = np.random.default_rng(71)
    n = 8000
    df = pd.DataFrame({"k": np.arange(n), "w": rng.integers(1, 100, n).astype("int64")})
    ds = ray.data.from_pandas(df).repartition(5)
    kept = importance_sample(ds, "k", "w", target_frac=0.3, salt="t").to_pandas()
    # expected keep fraction ~ target
    assert 0.25 < len(kept) / n < 0.35
    # inclusion probability proportional to weight: mean weight of the
    # kept set must exceed the population mean materially
    assert kept["w"].mean() > df["w"].mean() * 1.2
    # deterministic at any layout
    kept2 = importance_sample(ray.data.from_pandas(df), "k", "w",
                              target_frac=0.3, salt="t").to_pandas()
    assert sorted(kept["k"]) == sorted(kept2["k"])
    # zero/negative weights never qualify
    dfz = pd.DataFrame({"k": [1, 2], "w": [0, -5]})
    assert importance_sample(ray.data.from_pandas(dfz), "k", "w",
                             target_frac=1.0).count() == 0


def test_negative_pair_triplets(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.sampling import negative_pair

    n = 400
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "text": [f"cap{i}" for i in range(n)]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = negative_pair(ds, "doc_id", ["text"], salt="neg").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # every anchor appears exactly once with its own positive caption
    assert list(out["doc_id"]) == list(range(n))
    assert (out["text"] == [f"cap{i}" for i in range(n)]).all()
    # negatives: never self, valid id, payload consistent with the id
    assert (out["neg_doc_id"] != out["doc_id"]).all()
    assert out["neg_doc_id"].between(0, n - 1).all()
    assert (out["neg_text"] == out["neg_doc_id"].map(lambda i: f"cap{i}")).all()
    # deterministic at any layout; a different salt redraws
    out2 = negative_pair(ray.data.from_pandas(df), "doc_id", ["text"],
                         salt="neg").to_pandas().sort_values("doc_id")
    assert list(out2["neg_doc_id"]) == list(out["neg_doc_id"])
    out3 = negative_pair(ds, "doc_id", ["text"], salt="epoch1").to_pandas() \
        .sort_values("doc_id")
    assert list(out3["neg_doc_id"]) != list(out["neg_doc_id"])
    # negatives are near-uniform: no negative id dominates
    assert out["neg_doc_id"].value_counts().max() <= 12


def test_quantize_embeddings_roundtrip(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.linalg import embedding_extrema, quantize_embeddings

    rng = np.random.default_rng(9)
    x = rng.normal(0, 3, (300, 6)).astype(np.float32)
    x[:, 4] = 7.5                      # constant dim -> code 0
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = quantize_embeddings(ds, "embedding", bits=8).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    q = np.stack([np.asarray(c) for c in out["embedding_q8"]])
    assert q.dtype == np.uint8 and q.shape == (300, 6)
    assert (q[:, 4] == 0).all()
    # dequantized error bounded by half a step per dim
    ex = embedding_extrema(ds, "embedding")
    mn = ex["mn"].to_numpy()
    sc = (ex["mx"].to_numpy() - mn) / 255.0
    back = mn + q * sc
    err = np.abs(back - x.astype(np.float64))
    lim = np.where(sc == 0.0, np.abs(x.astype(np.float64) - mn), sc / 2)
    assert (err <= lim[None, :].repeat(300, 0) + 1e-12).all()
    # extrema reuse: quantizing new vectors with a training split's
    # extrema reproduces the same affine code assignment
    out2 = quantize_embeddings(ds, "embedding", bits=8, extrema=ex).to_pandas() \
        .sort_values("vec_id")
    q2 = np.stack([np.asarray(c) for c in out2["embedding_q8"]])
    assert (q2 == q).all()
    # 4-bit codes stay in range
    q4 = quantize_embeddings(ds, "embedding", bits=4).to_pandas()
    assert max(np.asarray(c).max() for c in q4["embedding_q4"]) <= 15


def test_spearman_corr_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import spearman_corr

    rng = np.random.default_rng(23)
    n = 2000
    x = rng.normal(0, 1, n)
    y = 2 * x + rng.normal(0, 1, n)          # strong monotone dependence
    x[rng.choice(n, 30, replace=False)] = np.nan
    df = pd.DataFrame({"x": np.round(x, 1), "y": np.round(y, 1)})  # force ties
    ds = ray.data.from_pandas(df).repartition(5)
    out = spearman_corr(ds, "x", "y")
    # pandas reference (average-rank spearman, pairwise complete)
    ref = df.dropna().corr(method="spearman").iloc[0, 1]
    assert out["n_pairs"].iloc[0] == len(df.dropna())
    assert abs(out["spearman"].iloc[0] - ref) < 1e-6
    # perfect monotone -> exactly 1.0; constant side -> null
    mono = pd.DataFrame({"x": np.arange(100.0), "y": np.arange(100.0) ** 3})
    assert spearman_corr(ray.data.from_pandas(mono), "x", "y")["spearman"].iloc[0] == 1.0
    const = pd.DataFrame({"x": np.arange(50.0), "y": np.full(50, 3.0)})
    assert np.isnan(spearman_corr(ray.data.from_pandas(const), "x", "y")["spearman"].iloc[0])


def test_curriculum_shards_ntile(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.sampling import curriculum_shards

    n = 103                               # not divisible by 8
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(n), "score": rng.integers(0, 30, n)})
    out = curriculum_shards(ray.data.from_pandas(df).repartition(4),
                            order_by=["score", "id"], n_shards=8) \
        .to_pandas().sort_values(["score", "id"]).reset_index(drop=True)
    # NTILE: first n%8 shards get q+1 rows, contiguous in sorted order
    sizes = out.groupby("shard").size()
    q, r = divmod(n, 8)
    assert sorted(sizes, reverse=True) == [q + 1] * r + [q] * (8 - r)
    assert (out["shard"].to_numpy() == np.sort(out["shard"].to_numpy())).all()
    # monotone: a later-sorted row never lands in an earlier shard
    assert out["shard"].iloc[0] == 1 and out["shard"].iloc[-1] == 8


def test_target_encode_expanding_daily(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import target_encode_expanding_daily

    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n),
        "ts": pd.to_datetime(rng.integers(0, 10, n), unit="D")
              + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
        "cat": rng.choice(["a", "b", "c"], n),
        "y": np.round(rng.normal(10, 3, n), 2),
    })
    df.loc[rng.choice(n, 25, replace=False), "y"] = np.nan
    out = target_encode_expanding_daily(
        ray.data.from_pandas(df).repartition(4), cat_col="cat",
        target_col="y", time_col="ts",
    ).to_pandas().set_index("id").sort_index()
    # unit-safe calendar days (the engine normalizes to us; a raw
    # .astype("int64") on this ns-resolution frame would give ns-scale
    # pseudo-days — the exact bug the round-5 dtype axis removed)
    day = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    for i in range(n):
        mask = (df["cat"] == df["cat"].iloc[i]).to_numpy() & (day < day[i])
        prior = df.loc[mask, "y"].dropna()
        got = out.loc[i, "y_te_asof"]
        if len(prior) == 0:
            assert np.isnan(got), i
        else:
            cents = np.rint(prior.to_numpy() * 100).astype(np.int64)
            assert got == cents.sum() / len(cents) / 100.0, i
    # leakage check: a huge same-day outlier must NOT move its own encoding
    probe = df.copy()
    probe.loc[0, "y"] = 1e6
    o2 = target_encode_expanding_daily(
        ray.data.from_pandas(probe), cat_col="cat", target_col="y",
        time_col="ts").to_pandas().set_index("id").sort_index()
    same_day_cat = (df["cat"] == df["cat"].iloc[0]).to_numpy() & (day == day[0])
    for j in np.flatnonzero(same_day_cat):
        a, b = out.loc[j, "y_te_asof"], o2.loc[j, "y_te_asof"]
        assert (np.isnan(a) and np.isnan(b)) or a == b


def test_kmeans_recovers_blobs_and_is_layout_invariant(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.linalg import (
        kmeans_assign, kmeans_iterate, kmeans_seed_centroids)

    rng = np.random.default_rng(7)
    centers = np.array([[8.0, 0.0], [-8.0, 0.0], [0.0, 8.0]])
    pts = np.concatenate([rng.normal(c, 0.5, size=(60, 2)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(pts)),
                       "embedding": [r.astype(np.float32) for r in pts]})
    ds = ray.data.from_pandas(df).repartition(5)

    seeds = kmeans_seed_centroids(ds, "embedding", 3, id_col="vec_id")
    # seeds = 3 smallest vec_ids — all from blob 0; Lloyd must still
    # separate the blobs within a few rounds
    cents, counts = kmeans_iterate(ds, "embedding", seeds, iters=8)
    assert counts.sum() == len(pts)
    # every true center is within 0.5 of some learned centroid
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=1)) < 0.5
    # layout invariance: different partitioning, identical centroids
    cents2, counts2 = kmeans_iterate(ds.repartition(11), "embedding", seeds, iters=8)
    assert np.allclose(cents, cents2) and (counts == counts2).all()

    asg = kmeans_assign(ds, "embedding", cents).to_pandas()
    # assignment is pure: each point belongs to its blob's centroid
    lbl = asg.sort_values("vec_id")["cluster"].to_numpy()
    for b in range(3):
        blob = lbl[b * 60:(b + 1) * 60]
        assert (blob == blob[0]).all()


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.linalg import kmeans_iterate

    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [np.array([0.0, 0.0], np.float32),
                                     np.array([1.0, 1.0], np.float32)]})
    ds = ray.data.from_pandas(df)
    # third centroid far away: no point assigns to it, it must persist
    seeds = np.array([[0.0, 0.0], [1.0, 1.0], [100.0, 100.0]])
    cents, counts = kmeans_iterate(ds, "embedding", seeds, iters=3)
    assert counts.tolist() == [1, 1, 0]
    assert np.allclose(cents[2], [100.0, 100.0])


def test_label_centroid_cosine_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.linalg import label_centroid_cosine

    # label 0: two colinear vectors -> centroid colinear -> cos = 1.0;
    # label 1: two orthogonal unit vectors -> centroid at 45°, cos = 1/sqrt(2);
    # label None dropped; zero vector -> null score
    df = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4, 5],
        "label": pd.array([0, 0, 1, 1, None, 2], dtype="Int64"),
        "embedding": [np.array([1, 0], np.float32), np.array([2, 0], np.float32),
                      np.array([1, 0], np.float32), np.array([0, 1], np.float32),
                      np.array([9, 9], np.float32), np.array([0, 0], np.float32)],
    })
    out = label_centroid_cosine(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert out["vec_id"].tolist() == [0, 1, 2, 3, 5]  # null label dropped
    c = out.set_index("vec_id")["cos_centroid"]
    assert c[0] == 1.0 and c[1] == 1.0
    assert np.isclose(c[2], round(1 / np.sqrt(2), 6))
    assert np.isclose(c[3], round(1 / np.sqrt(2), 6))
    assert np.isnan(c[5])  # zero-norm vector


def test_time_split_embargo_purges_gap(ray_session):
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.sampling import time_split_embargo

    ts = pd.to_datetime(["2024-01-01", "2024-01-09 23:59:59.999999",
                         "2024-01-10 00:00:00", "2024-01-11 12:00:00",
                         "2024-01-12 00:00:00", "2024-01-20 00:00:00"],
                        format="mixed")
    df = pd.DataFrame({"i": range(6), "ts": ts})
    out = time_split_embargo(
        ray.data.from_pandas(df).repartition(2), "ts",
        cutoff="2024-01-12", embargo_us=2 * 86_400_000_000,
    ).to_pandas().sort_values("i").reset_index(drop=True)
    # embargo window [01-10, 01-12) purged: rows 2 and 3 gone
    assert out["i"].tolist() == [0, 1, 4, 5]
    assert out["split"].tolist() == ["train", "train", "test", "test"]


def test_psi_daily_detects_planted_shift(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import psi_daily

    rng = np.random.default_rng(9)
    # days 0-3 ~ N(0,1); day 4 shifted to N(3,1); day 6 observed but day
    # 5 missing -> no row for day 6
    frames = []
    for d in [0, 1, 2, 3, 4, 6]:
        mu = 3.0 if d == 4 else 0.0
        frames.append(pd.DataFrame({
            "ts": pd.to_datetime(d * 86_400 + np.arange(400), unit="s"),
            "value": rng.normal(mu, 1, 400),
        }))
    df = pd.concat(frames, ignore_index=True)
    out = psi_daily(ray.data.from_pandas(df).repartition(5), "value", "ts", bins=10)
    assert out["day"].tolist() == [1, 2, 3, 4]  # day 6 skipped (gap)
    psi = out.set_index("day")["psi"]
    assert psi[4] > 1.0                      # the planted shift screams
    assert (psi[[1, 2, 3]] < 0.1).all()      # stable days stay quiet
    assert (out["n_ref"] == 400).all() and (out["n_cur"] == 400).all()


def test_chi2_independence_matches_scipy_formula(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.stats import chi2_independence

    rng = np.random.default_rng(31)
    # dependent: b follows a 70% of the time
    a = rng.choice(["x", "y", "z"], 600)
    b = np.where(rng.random(600) < 0.7, a, rng.choice(["x", "y", "z"], 600))
    df = pd.DataFrame({"a": a, "b": b})
    out = chi2_independence(ray.data.from_pandas(df).repartition(4), "a", "b")
    # reference: the closed-form Pearson statistic
    piv = pd.crosstab(df["a"], df["b"]).to_numpy(np.float64)
    n = piv.sum()
    e = piv.sum(1, keepdims=True) @ piv.sum(0, keepdims=True) / n
    ref = ((piv - e) ** 2 / e).sum()
    assert np.isclose(out["chi2"].iloc[0], ref, atol=1e-5)
    assert out["dof"].iloc[0] == 4 and out["n"].iloc[0] == 600
    # strong dependence must register
    assert out["chi2"].iloc[0] > 100


def test_cusum_changepoint_localizes_shift():
    """A clean level shift is localized at the last pre-shift row (the
    |S_k| argmax); an entity with nulls or too few rows is skipped."""
    from temporalscope_ray.stages.stats import cusum_changepoint_by_entity

    ts = pd.date_range("2024-01-01", periods=40, freq="1h")
    v = np.concatenate([np.zeros(20), np.full(20, 10.0)])
    df = pd.DataFrame({"user_id": 1, "event_id": np.arange(40), "ts": ts, "value": v})
    skip = pd.DataFrame({"user_id": 2, "event_id": [0, 1], "ts": ts[:2], "value": [1.0, None]})
    ds = ray.data.from_pandas(pd.concat([df, skip], ignore_index=True))
    out = cusum_changepoint_by_entity(ds, "user_id", "ts", "value",
                                      tiebreak=["event_id"], num_buckets=2).to_pandas()
    assert list(out["user_id"]) == [1]
    assert int(out["cp_index"].iloc[0]) == 20  # last pre-shift row (1-based)
    assert float(out["s_max"].iloc[0]) == 100.0  # |20*(0-5)| = 100


def test_volume_bars_fixed_information():
    """Bars close every `threshold` units of |value|: a burst of large
    values produces more bars than the same row count of small ones;
    per-bar OHLC matches a hand computation."""
    from temporalscope_ray.stages.agg import volume_bars

    ts = pd.date_range("2024-01-01", periods=6, freq="1min")
    df = pd.DataFrame({"user_id": 1, "event_id": np.arange(6), "ts": ts,
                       "value": [5.0, 5.0, 5.0, -5.0, 30.0, 30.0]})
    ds = ray.data.from_pandas(df)
    out = volume_bars(ds, "user_id", "ts", "value", threshold=10.0,
                      tiebreak=["event_id"], num_buckets=2).to_pandas()
    out = out.sort_values("bar_id").reset_index(drop=True)
    # exclusive prefix: 0,5,10,15,20,50 → bars 0,0,1,1,2,5
    assert list(out["bar_id"]) == [0, 1, 2, 5]
    b0 = out.iloc[0]
    assert (b0["open_v"], b0["close_v"], b0["n"]) == (5.0, 5.0, 2)
    b1 = out.iloc[1]  # rows 2,3: values 5, -5 → low −5, volume 10
    assert (b1["low_v"], b1["volume"], b1["n"]) == (-5.0, 10.0, 2)
    assert (out.iloc[2]["volume"], out.iloc[2]["n"]) == (30.0, 1)


def test_max_drawdown_hand_series(ray_session):
    """Cumulative 1,2,3,-5,... — peak 6 at t3, trough 1 at t4 -> dd 5."""
    df = pd.DataFrame({
        "user_id": [7] * 4, "event_id": range(4),
        "ts": pd.date_range("2024-01-01", periods=4, freq="1h"),
        "value": [1.0, 2.0, 3.0, -5.0],
    })
    out = stats.max_drawdown_by_entity(
        ray.data.from_pandas(df), "user_id", "ts", "value",
        tiebreak=["event_id"]).to_pandas()
    assert out.loc[0, "max_drawdown"] == 5.0 and out.loc[0, "n"] == 4


def test_pca_power_sign_fix_and_dominant_axis(ray_session):
    """Variance planted on axis 2 with a negative-leaning cloud: the
    loading must recover axis 2 and come out POSITIVE (sign fix)."""
    from temporalscope_ray.stages.linalg import pca_power_loadings

    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.01, size=(400, 4))
    x[:, 2] -= rng.exponential(3.0, size=400)  # dominant, negative-skewed
    df = pd.DataFrame({"embedding": list(x.astype(np.float32))})
    out = pca_power_loadings(ray.data.from_pandas(df).repartition(3), "embedding")
    lead = out.set_index("i")["loading"]
    assert abs(lead[2]) > 0.99 and lead[2] > 0  # dominant + flipped positive


def test_ols_calendar_recovers_planted_slopes(ray_session):
    """value = 3 + 0.5*hour + 2*isodow exactly -> betas recovered."""
    from temporalscope_ray.stages.stats import ols_calendar_by_group

    ts = pd.date_range("2024-01-01", periods=500, freq="7h")
    h, d = ts.hour.to_numpy(), ts.dayofweek.to_numpy() + 1
    df = pd.DataFrame({"ts": ts, "event_type": "x",
                       "value": 3 + 0.5 * h + 2.0 * d})
    out = ols_calendar_by_group(
        ray.data.from_pandas(df).repartition(4), "event_type", "ts", "value"
    ).to_pandas()
    assert abs(out.loc[0, "b0"] - 3) < 1e-6
    assert abs(out.loc[0, "b_hour"] - 0.5) < 1e-6
    assert abs(out.loc[0, "b_dow"] - 2.0) < 1e-6


def test_spectral_amplitude_pure_daily_rhythm(ray_session):
    """Events at a fixed hour each day: daily amplitude ~1 (all mass at
    the 24h frequency); a flat hourly series gives amplitude ~0."""
    from temporalscope_ray.stages.stats import spectral_amplitude_by_group

    daily = pd.DataFrame({
        "ts": pd.date_range("2024-01-01 09:00", periods=60, freq="24h"),
        "event_type": "rhythmic"})
    flat = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=24 * 60, freq="1h"),
        "event_type": "flat"})
    out = spectral_amplitude_by_group(
        ray.data.from_pandas(pd.concat([daily, flat], ignore_index=True)).repartition(3),
        "ts", "event_type", periods_hours=(24,)).set_index("g")
    assert out.loc["rhythmic", "amplitude"] > 0.999
    assert out.loc["flat", "amplitude"] < 0.01


def test_holt_matches_sequential_reference(ray_session):
    """The vectorized across-entity scan must equal a plain per-row
    Python recursion for every row of a multi-entity frame."""
    from temporalscope_ray.stages.stats import holt_smooth_by_entity

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "user_id": np.repeat([1, 2, 3], [50, 1, 17]),
        "event_id": range(68),
        "ts": pd.date_range("2024-01-01", periods=68, freq="1h"),
        "value": rng.normal(size=68),
    })
    out = holt_smooth_by_entity(
        ray.data.from_pandas(df).repartition(4), "user_id", "ts", "value",
        alpha=0.3, beta=0.1, tiebreak=["event_id"], keep_cols=["event_id"],
        num_buckets=4).to_pandas().set_index("event_id").sort_index()
    a, b = 0.3, 0.1
    for uid, g in df.groupby("user_id"):
        l_prev = b_prev = None
        for _, row in g.iterrows():
            if l_prev is None:
                l_cur, b_cur = row["value"], 0.0
            else:
                l_cur = a * row["value"] + (1.0 - a) * (l_prev + b_prev)
                b_cur = b * (l_cur - l_prev) + (1.0 - b) * b_prev
            assert out.loc[row["event_id"], "holt_level"] == l_cur
            assert out.loc[row["event_id"], "holt_trend"] == b_cur
            l_prev, b_prev = l_cur, b_cur


def test_benford_separates_natural_from_uniform(ray_session):
    """Log-normal values follow Benford (low MAD); uniform [1,2) values
    all lead with digit 1 (huge chi2). The audit must separate them."""
    from temporalscope_ray.stages.stats import benford_deviation_by_group

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "event_type": ["natural"] * 5000 + ["flat"] * 5000,
        "value": np.concatenate([
            np.exp(rng.normal(0, 3, 5000)),      # spans many decades -> Benford
            rng.uniform(1.0, 2.0, 5000),          # every first digit is 1
        ]),
    })
    out = benford_deviation_by_group(
        ray.data.from_pandas(df).repartition(4), "event_type", "value"
    ).set_index("g")
    assert out.loc["natural", "mad"] < 0.01
    assert out.loc["flat", "chi2"] > 100 * out.loc["natural", "chi2"]


def test_trend_break_recovers_planted_kink(ray_session):
    """Flat around 0 for 40 rows, then a +100 level jump with slope +3:
    the CUSUM argmax must land at the mean shift and the per-side OLS
    must recover slope 0 and slope 3."""
    from temporalscope_ray.stages.stats import trend_break_by_entity

    y = np.concatenate([np.zeros(40), 100.0 + 3.0 * np.arange(40)])
    df = pd.DataFrame({
        "user_id": [5] * 80, "event_id": range(80),
        "ts": pd.date_range("2024-01-01", periods=80, freq="1h"),
        "value": y,
    })
    out = trend_break_by_entity(ray.data.from_pandas(df).repartition(3),
                                "user_id", "ts", "value",
                                tiebreak=["event_id"]).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["cp_index"] == 40  # CUSUM localizes the mean shift
    assert abs(row["slope_pre"]) < 0.01
    assert abs(row["slope_post"] - 3.0) < 0.01


def test_kaplan_meier_hand_curve(ray_session):
    """3 users convert on days 1, 2, 2; one censored at day 3:
    S(1) = 1 - 1/4 = 0.75; S(2) = 0.75 * (1 - 2/3) = 0.25."""
    from temporalscope_ray.stages.stats import kaplan_meier_survival

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for uid, (conv_day, converts) in enumerate(
            [(1, True), (2, True), (2, True), (3, False)]):
        rows.append((uid, t0, "view"))
        rows.append((uid, t0 + pd.Timedelta(days=conv_day),
                     "purchase" if converts else "view"))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = kaplan_meier_survival(
        ray.data.from_pandas(df).repartition(2), "user_id", "ts",
        "event_type", "purchase").set_index("t")
    assert out.loc[1, "n_risk"] == 4 and out.loc[1, "d_events"] == 1
    assert out.loc[1, "survival"] == 0.75
    assert out.loc[2, "n_risk"] == 3 and out.loc[2, "d_events"] == 2
    assert out.loc[2, "survival"] == 0.25


def test_key_units_arrow_equals_series_paths():
    """The round-5 Arrow-native key path must produce BIT-IDENTICAL
    uint64s to the pandas-Series path it bypasses, for every dtype and
    both portable modes, salted and unsalted — otherwise split/sample
    membership silently changes with the caller's batch format."""
    import pyarrow as pa

    from temporalscope_ray.stages.sampling import _key_units

    ints = np.array([0, 1, -7, 123456789, 2**62], dtype=np.int64)
    floats = np.array([0.0, -1.5, 3.25e10], dtype=np.float64)
    strs = ["a", "doc-42", "ünïcode", ""]
    cases = [
        (pa.chunked_array([ints[:3], ints[3:]]), pd.Series(ints)),
        (pa.chunked_array([floats]), pd.Series(floats)),
        (pa.chunked_array([strs]), pd.Series(strs)),
        # nulls force the hash_pandas_object fallback branch
        (pa.chunked_array([pa.array([1, None, 3], type=pa.int64())]),
         pd.Series(pa.array([1, None, 3], type=pa.int64()).to_pandas())),
    ]
    for arrow_col, series in cases:
        for salt in ("", "s1"):
            fast_a = _key_units(arrow_col, salt=salt, portable=False)
            fast_s = _key_units(series, salt=salt, portable=False)
            np.testing.assert_array_equal(fast_a, fast_s)
    # portable: ints exercise the Arrow cast-kernel stringify branch
    for arrow_col, series in cases[:1] + cases[2:3]:
        for salt in ("", "s1"):
            port_a = _key_units(arrow_col, salt=salt, portable=True)
            port_s = _key_units(series, salt=salt, portable=True)
            np.testing.assert_array_equal(port_a, port_s)
