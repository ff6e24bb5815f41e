"""Round-3 regression tests for the ADVICE.md latent divergences:
tie-safe top-k pruning, null order keys in CDC compaction, whitespace
normalization parity in fingerprints, and duplicate-timestamp throttle
determinism — each pinned against a DuckDB or pandas micro-oracle on
adversarial in-memory data the sf corpora happen not to contain."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data


def test_top_k_rows_tie_safe_block_prune(ray_session):
    # every value equal: the block-local argpartition prune used to keep
    # an ARBITRARY candidate before the tiebreak sort ran, so the global
    # min-id row could be discarded inside its own block
    from temporalscope_ray.stages.agg import top_k_rows

    rng = np.random.default_rng(7)
    ids = rng.permutation(1000)
    df = pd.DataFrame({"id": ids, "v": np.full(1000, 5.0)})
    got = top_k_rows(ray.data.from_pandas(df).repartition(9), "v", 3,
                     tiebreak=["id"])
    assert got["id"].tolist() == [0, 1, 2]

    # tied maxima with a margin: ten rows share the max, k=4 must be the
    # four smallest ids among them regardless of block layout
    v = rng.uniform(0, 1, 500)
    hot = rng.choice(500, 10, replace=False)
    v[hot] = 2.0
    df2 = pd.DataFrame({"id": np.arange(500), "v": v})
    got2 = top_k_rows(ray.data.from_pandas(df2).repartition(8), "v", 4,
                      tiebreak=["id"])
    assert got2["id"].tolist() == sorted(hot.tolist())[:4]


def test_latest_row_per_key_null_order_key(ray_session):
    # a null ts must never beat a real one (SQL DESC ranks NULLs last);
    # an all-null key still emits one row
    from temporalscope_ray.stages.agg import latest_row_per_key

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b"],
        "ts": pd.to_datetime(["2024-01-01", None, "2024-01-03", None, None]),
        "seq": [1, 2, 3, 4, 5],
    })
    out = latest_row_per_key(
        ray.data.from_pandas(df).repartition(3), "k",
        order_by=["ts", "seq"], num_buckets=4,
    ).to_pandas().set_index("k")
    assert out.loc["a", "seq"] == 3          # max non-null ts wins
    assert pd.isna(out.loc["b", "ts"]) and out.loc["b", "seq"] == 5


def test_fingerprint_whitespace_parity_with_sql(ray_session):
    # leading/trailing \n \t \r: pandas .str.strip() strips them, DuckDB
    # trim() strips only spaces — the oracle collapses \s+ BEFORE
    # trimming so both sides agree; pin that on adversarial docs
    from temporalscope_ray.stages.text import Fingerprint

    texts = ["\nHello  World\t", "  plain  ", "\t\r\n", None,
             "a\nb\tc", "x \n y", ""]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    eng = ray.data.from_pandas(df).map_batches(
        Fingerprint(portable=True), batch_format="pandas").to_pandas()
    u = eng["fingerprint"].to_numpy(np.int64).view(np.uint64)
    eng_mod = pd.Series((u % np.uint64(1_000_000_007)).astype(np.int64),
                        index=eng["doc_id"]).sort_index()

    con = duckdb.connect()
    con.register("documents", df)
    sql = con.execute("""
        SELECT doc_id,
               CAST(md5_number_lower(
                    trim(regexp_replace(lower(COALESCE(text, '')),
                                        '\\s+', ' ', 'g')))
                    % 1000000007 AS BIGINT) AS fp_mod
        FROM documents ORDER BY doc_id
    """).df()
    assert eng_mod.tolist() == sql["fp_mod"].tolist()


def test_throttle_duplicate_timestamps_vs_sql(ray_session):
    # duplicate (user_id, ts) pairs: the engine keeps exactly one row
    # per kept timestamp (min event_id via the tiebreak); the oracle
    # must dedupe its resolve join the same way
    from temporalscope_ray.stages.window_features import throttle

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for uid in range(6):
        rng = np.random.default_rng(100 + uid)
        ts_offsets = np.sort(rng.integers(0, 48 * 3600, 40))
        for off in ts_offsets:
            # inject duplicates: every third event repeated at same ts
            for _ in range(1 + (eid % 3 == 0)):
                rows.append((eid, base + pd.Timedelta(seconds=int(off)), uid))
                eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    # verify the adversarial property actually holds
    assert df.duplicated(["user_id", "ts"]).any()

    got = throttle(ray.data.from_pandas(df).repartition(5), "user_id", "ts",
                   min_gap_us=6 * 3_600_000_000, tiebreak=["event_id"],
                   num_buckets=4).to_pandas()

    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH RECURSIVE keep AS (
          SELECT user_id, MIN(ts) AS ts FROM events GROUP BY user_id
          UNION ALL
          SELECT k.user_id,
                 (SELECT MIN(e.ts) FROM events e
                  WHERE e.user_id = k.user_id
                    AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000) AS ts
          FROM keep k
          WHERE EXISTS (SELECT 1 FROM events e
                        WHERE e.user_id = k.user_id
                          AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000))
        SELECT e.event_id, e.ts, e.user_id
        FROM keep JOIN events e USING (user_id, ts)
        QUALIFY row_number() OVER (PARTITION BY e.user_id, e.ts
                                   ORDER BY e.event_id) = 1
    """).df()
    key = ["user_id", "ts", "event_id"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = want[key].sort_values(key).reset_index(drop=True)
    want_s["ts"] = want_s["ts"].astype("datetime64[us]")
    got_s["ts"] = got_s["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_time_rolling_duplicate_ts_peers_match_sql_range(ray_session):
    # SQL RANGE ... CURRENT ROW makes duplicate-(entity, ts) rows PEERS
    # (each includes the other); pandas time rolling is positional among
    # equal timestamps — the engine must follow the SQL frame
    from temporalscope_ray.stages.window_features import add_time_rolling_features

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                              "2024-01-01 00:10", "2024-01-01 00:50",
                              "2024-01-01 00:00", "2024-01-01 00:00"]),
        "value": [1.0, 2.0, 4.0, 8.0, 3.0, 5.0],
        "event_id": [0, 1, 2, 3, 4, 5],
    })
    out = add_time_rolling_features(
        ray.data.from_pandas(df).repartition(3), id_col="user_id", time_col="ts",
        value_cols=["value"], window=pd.Timedelta("30min"), num_buckets=2,
        tiebreak=["event_id"],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("ev", df)
    want = con.execute("""
        SELECT event_id,
               AVG(value) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW) AS m
        FROM ev ORDER BY event_id
    """).df()
    np.testing.assert_allclose(out["value_troll_mean"].to_numpy(), want["m"].to_numpy())
