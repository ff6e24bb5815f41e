"""Adversarial-data parity sweep.

The sf corpora happen to satisfy invariants the oracles could silently
assume — most dangerously, UNIQUE (user_id, ts) pairs in events. This
script injects ~1% duplicate-(user_id, ts) rows (fresh event_ids,
perturbed values) into a copy of sf0.001 and replays EVERY
queries()/oracle_sql() pair on the mutated tables: any operator or
oracle whose result depends on row order among timestamp ties diverges
here long before real data finds it. (Round-3 catch: time-rolling
peer semantics — pandas is positional among equal timestamps, SQL
RANGE frames are not.)

Usage: python adv_sweep.py   (exit 1 on any mismatch/error)
"""
import os, shutil, sys, traceback
import duckdb, numpy as np, pandas as pd
import pyarrow.parquet as pq, pyarrow as pa

SRC = "/root/testdata/sf0.001"
TINY = len(sys.argv) > 1 and sys.argv[1] == "tiny"
DST = "/tmp/sf_adv_tiny" if TINY else "/tmp/sf_adv"
if os.path.exists(DST):
    shutil.rmtree(DST)
os.makedirs(DST)

SKEW = len(sys.argv) > 1 and sys.argv[1] == "skew"
if SKEW:
    DST = "/tmp/sf_adv_skew"
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    # Hot-entity axis (the north rule's phash-skewed regime): ONE user
    # owns 70% of all events (ids stay unique; timestamps untouched, so
    # the hot entity also gains duplicate-(user, ts) pairs). Every
    # per-entity window/session/shift kernel and its oracle must agree
    # when one group dwarfs the rest — the regime the chunked overflow
    # path and salting exist for.
    for f in os.listdir(SRC):
        if f == "events.parquet":
            t = pq.read_table(os.path.join(SRC, f)).to_pandas()
            hot = int(t["user_id"].mode().iloc[0])
            rng = np.random.default_rng(77)
            take = rng.random(len(t)) < 0.7
            t.loc[take, "user_id"] = hot
            pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                           os.path.join(DST, f))
            print(f"events: user {hot} now owns {int(take.sum())}/{len(t)} rows")
        else:
            shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))

WIDE = len(sys.argv) > 1 and sys.argv[1] == "wide"
if WIDE:
    DST = "/tmp/sf_adv_wide"
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    # Maximal-cardinality axis (the opposite regime of `skew`): EVERY
    # event becomes its own entity (user_id := a unique id derived from
    # event_id). Group count == row count: every per-entity kernel runs
    # on 1-row groups across the full table, every groupby carries the
    # maximum number of keys, hot-key detection must find NOTHING, and
    # sessions/lags/rolling windows all hit their single-element
    # boundary simultaneously — at scale this is the "user_id is nearly
    # a primary key" workload (e.g. request ids mistaken for users).
    for f in os.listdir(SRC):
        if f == "events.parquet":
            t = pq.read_table(os.path.join(SRC, f)).to_pandas()
            t["user_id"] = t["event_id"].to_numpy() + 1_000_000
            pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                           os.path.join(DST, f))
            print(f"events: {len(t)} rows, {t['user_id'].nunique()} distinct users (1 row/entity)")
        else:
            shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))

OLD = len(sys.argv) > 1 and sys.argv[1] == "old"
if OLD:
    DST = "/tmp/sf_adv_old"
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    # Pre-1970 axis: shift every timestamp so the corpus STRADDLES the
    # epoch (negative microsecond values). Floor-division bucketing on
    # negative int64 is where engines silently fork: numpy // floors
    # (bucket starts are correct calendar boundaries), DuckDB's //
    # truncates toward zero — the oracles must use epoch-safe forms.
    import pandas as _pd
    SHIFT = _pd.Timestamp("2024-06-01") - _pd.Timestamp("1969-12-28")
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f)).to_pandas()
        for c in t.columns:
            if t[c].dtype.kind == "M":
                t[c] = t[c] - SHIFT
        pq.write_table(pa.Table.from_pandas(t, preserve_index=False), os.path.join(DST, f))
    print(f"old-mode corpus written (all timestamps shifted by -{SHIFT})")

DTYPE = len(sys.argv) > 1 and sys.argv[1] == "dtype"
if DTYPE:
    DST = "/tmp/sf_adv_dtype"
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    # Numeric-width axis (VERDICT r4 #6): every corpus so far kept its
    # canonical dtypes, so the cast-boundary class (float32
    # accumulation, narrow ints, ms-resolution timestamps) was never
    # exercised. Narrow every column that fits: int64 -> int32 (when
    # the value range allows), float64 -> float32, timestamp[us] ->
    # timestamp[ms] (truncating). BOTH sides read the same narrowed
    # parquet, so parity holds iff the ENGINE widens to float64/us at
    # the right place — exactly like DuckDB, which promotes on read.
    import pyarrow.compute as pc
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        cols, fields = [], []
        for field in t.schema:
            col = t.column(field.name)
            ty = field.type
            if pa.types.is_int64(ty):
                mm = pc.min_max(col).as_py()
                if mm["min"] is not None and -2**31 <= mm["min"] and mm["max"] < 2**31:
                    col, ty = pc.cast(col, pa.int32()), pa.int32()
            elif pa.types.is_float64(ty):
                col, ty = pc.cast(col, pa.float32()), pa.float32()
            elif pa.types.is_timestamp(ty):
                col = pc.cast(col, pa.timestamp("ms"), safe=False)
                ty = pa.timestamp("ms")
            cols.append(col)
            fields.append(pa.field(field.name, ty))
        pq.write_table(pa.table(cols, schema=pa.schema(fields)), os.path.join(DST, f))
    print("dtype-mode corpus written (int32 ids, float32 values, ms timestamps)")

EMPTY = len(sys.argv) > 1 and sys.argv[1] == "empty"
if EMPTY:
    DST = "/tmp/sf_adv_empty"
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    # Zero-row axis: every table is EMPTY. NOTE (probed, pinned in
    # tests/test_null_unicode_semantics.py): Ray's read_parquet DROPS
    # the schema of a 0-row file the moment a block materializes, so
    # the engine sees schema-less datasets everywhere — the policy is
    # therefore "no silent wrong answers": a returned result must match
    # the SQL oracle; ANY raise is the acceptable documented contract
    # (reported for transparency at the end).
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 0), os.path.join(DST, f))
    print("empty-mode corpus written (0 rows, schemas kept)")

if TINY:
    # Boundary-condition corpus: the FIRST 3 rows of every table (head,
    # not sample — keeps the low ids the knn/asof queries reference).
    # Every kernel must survive 3-row inputs — single-element windows,
    # k > n top-k, empty strata, one-session entities — and still match
    # the SQL oracle exactly.
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 3), os.path.join(DST, f))
        print(f"{f}: {t.num_rows} -> {min(3, t.num_rows)} rows")
for f in [] if (TINY or OLD or SKEW or EMPTY or WIDE or DTYPE) else os.listdir(SRC):
    if f == "events.parquet":
        t = pq.read_table(os.path.join(SRC, f)).to_pandas()
        rng = np.random.default_rng(99)
        pick = t.sample(n=max(20, len(t)//100), random_state=7).copy()
        pick["event_id"] = np.arange(len(pick)) + int(t["event_id"].max()) + 1
        # duplicates share (user_id, ts) but differ in event_id AND value
        pick["value"] = pick["value"].to_numpy() + rng.normal(size=len(pick))
        out = pd.concat([t, pick], ignore_index=True)
        # NULL values + NULL props on a disjoint 1% sample (the clean
        # corpora contain ZERO nulls, so SQL-vs-engine null semantics —
        # AVG/SUM ignoring NULLs, json_extract of NULL, null ranks —
        # are otherwise never exercised)
        nullpick = out.sample(n=max(20, len(out) // 100), random_state=11).index
        out.loc[nullpick, "value"] = np.nan
        out.loc[out.sample(n=max(10, len(out) // 200), random_state=13).index, "props"] = None
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), os.path.join(DST, f))
        print(f"events: {len(t)} -> {len(out)} rows ({len(pick)} dup-(user,ts), "
              f"{len(nullpick)} null values injected)")
    elif f == "documents.parquet":
        d = pq.read_table(os.path.join(SRC, f)).to_pandas()
        extra = pd.DataFrame({
            "doc_id": np.arange(8) + int(d["doc_id"].max()) + 1,
            # \v and U+3000 pin the ASCII-whitespace-class parity: RE2's
            # \s is exactly [\t\n\f\r ], so both are NON-space there while
            # Python's unicode \s would treat them as spaces — the engine
            # must use the explicit ASCII classes to agree with the SQL
            "text": [None, "", "\n\t  \r\n", "word " * 3 + "\nword",
                     d["text"].iloc[0], "émojis 🎉 und ß-Umlaute, 日本語テキスト",
                     "a\vb c", "x　y end"],
            "lang": ["en"] * 8,
            "source": ["adv"] * 8,
            "n_chars": [0, 0, 5, 21, int(d["n_chars"].iloc[0]), 33, 5, 7],
        })
        dd = pd.concat([d, extra], ignore_index=True)
        pq.write_table(pa.Table.from_pandas(dd, preserve_index=False), os.path.join(DST, f))
        print(f"documents: {len(d)} -> {len(dd)} rows (null/empty/whitespace/dup/unicode texts)")
    elif f == "embeddings.parquet":
        t = pq.read_table(os.path.join(SRC, f)).to_pandas()
        dim = len(t["embedding"].iloc[0])
        base = int(t["vec_id"].max()) + 1
        # zero vector (failed encode — engine ANN contract: never a
        # neighbor), exact duplicates (cosine ties at 1.0 — tie-safe
        # top-k), tiny magnitude (float32 underflow probe: norm must be
        # computed in float64), negation (cos -1 boundary)
        extra = pd.DataFrame({
            "vec_id": np.arange(5) + base,
            "embedding": [np.zeros(dim, dtype=np.float32),
                          np.asarray(t["embedding"].iloc[0], dtype=np.float32),
                          np.asarray(t["embedding"].iloc[0], dtype=np.float32),
                          (np.asarray(t["embedding"].iloc[1], dtype=np.float32) * np.float32(1e-30)),
                          -np.asarray(t["embedding"].iloc[2], dtype=np.float32)],
            "label": np.array([0, 0, 0, 0, 0], dtype=np.int32),
        })
        tt = pd.concat([t, extra], ignore_index=True)
        sch = pa.schema([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32())])
        pq.write_table(pa.Table.from_pandas(tt, schema=sch, preserve_index=False), os.path.join(DST, f))
        print(f"embeddings: {len(t)} -> {len(tt)} rows (zero/dup/tiny/negated vectors)")
    elif f == "orders.parquet":
        t = pq.read_table(os.path.join(SRC, f)).to_pandas()
        rng = np.random.default_rng(23)
        pick = t.sample(n=max(10, len(t) // 100), random_state=29).copy()
        pick["o_orderkey"] = np.arange(len(pick)) + int(t["o_orderkey"].max()) + 1
        # duplicates share (o_custkey, o_orderdate) but differ in price —
        # the point-in-time dimension compaction must pick MAX, not
        # first-seen
        pick["o_totalprice"] = pick["o_totalprice"].to_numpy() + rng.uniform(-50, 50, len(pick))
        out = pd.concat([t, pick], ignore_index=True)
        out.loc[out.sample(n=max(5, len(out) // 200), random_state=31).index, "o_totalprice"] = np.nan
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), os.path.join(DST, f))
        print(f"orders: {len(t)} -> {len(out)} rows (dup-(custkey,date) + null totalprice)")
    elif f == "lineitem.parquet":
        t = pq.read_table(os.path.join(SRC, f)).to_pandas()
        for col, frac, seed in [("l_quantity", 100, 37), ("l_discount", 200, 41),
                                ("l_extendedprice", 200, 43)]:
            idx = t.sample(n=max(5, len(t) // frac), random_state=seed).index
            t.loc[idx, col] = np.nan
        pq.write_table(pa.Table.from_pandas(t, preserve_index=False), os.path.join(DST, f))
        print(f"lineitem: null l_quantity/l_discount/l_extendedprice injected ({len(t)} rows)")
    else:
        shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))

import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as e

con = duckdb.connect()
for tname in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{DST}/{tname}.parquet')")

qs, oracles = e.queries(), e.oracle_sql()

# Operators whose REFERENCE contract is to REJECT certain inputs with a
# loud verbatim-message raise — on the corpus that triggers the
# contract, the correct behavior IS the raise, asserted by message
if TINY:
    EXPECT_RAISE = {
        # SlidingWindowPartitioner's reference guard (verbatim message)
        "window_tags": "Insufficient rows",
        # SingleStepTargetShifter's reference guard: horizon >= rows
        "shift_multi_target": "All rows were dropped during transformation",
        # k-means cannot train k=4 centroids on 3 points — loud by design
        "kmeans_step_embeddings": "exceeds dataset rows",
    }
elif WIDE:
    EXPECT_RAISE = {
        # SingleStepTargetShifter contract: with 1-row entities a
        # per-entity horizon-3 shift drops EVERY row — the reference's
        # loud verbatim-message raise (same guard the tiny axis pins)
        "shift_multi_target": "All rows were dropped during transformation",
    }
elif OLD or SKEW or EMPTY or DTYPE:
    EXPECT_RAISE = {}
else:
    EXPECT_RAISE = {
        # TimeFrame/padding null validation (verbatim messages)
        "mean_pad_value": "Cannot process data containing null values",
        "validator_report": "Null values found in columns",
    }

bad, errs, raised, ok = [], [], [], 0
for name, fn in sorted(qs.items()):
    osql = oracles.get(name)
    if osql is None:
        continue
    if name in EXPECT_RAISE:
        try:
            fn(DST)
            bad.append((name, "expected null-validation raise, got a result"))
        except ValueError as ex:
            if EXPECT_RAISE[name] in str(ex):
                ok += 1
            else:
                errs.append((name, f"wrong raise: {str(ex)[:100]}"))
        except Exception as ex:
            errs.append((name, f"{type(ex).__name__}: {str(ex)[:110]}"))
        continue
    try:
        r = fn(DST)
        rdf = r.to_pandas() if hasattr(r, "to_pandas") else (r.to_pandas() if isinstance(r, pa.Table) else r)
        if isinstance(rdf, pa.Table): rdf = rdf.to_pandas()
        odf = con.execute(osql).df()
        if len(rdf) == 0 and len(odf) == 0:
            # both sides provably empty: Ray datasets that end empty are
            # schema-less by design (empty blocks are dropped), so the
            # column comparison is not meaningful — the row-count
            # agreement IS the check
            ok += 1
            continue
        key = sorted(rdf.columns)
        if sorted(odf.columns) != key:
            bad.append((name, f"schema {sorted(odf.columns)} vs {key}")); continue
        if len(rdf) != len(odf):
            bad.append((name, f"rows {len(rdf)} vs {len(odf)}")); continue
        for c in key:  # unit-insensitive datetime compare (ms vs us
            # storage of the same instant is not a value divergence;
            # assert_frame_equal would otherwise diff raw i8)
            if rdf[c].dtype.kind == "M" and odf[c].dtype.kind == "M":
                rdf[c] = rdf[c].astype("datetime64[us]")
                odf[c] = odf[c].astype("datetime64[us]")
        a = rdf[key].sort_values(key).reset_index(drop=True)
        b = odf[key].sort_values(key).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-7, atol=1e-9)
            ok += 1
        except AssertionError as ex:
            bad.append((name, str(ex).splitlines()[-1][:120]))
    except Exception as ex:
        if EMPTY:
            # empty-table policy: a fully-empty input table is
            # schema-less under Ray's block model (read_parquet of a
            # 0-row file drops the schema the moment a block
            # materializes — framework behavior, probed and pinned in
            # tests), so operators that need column names or data (a
            # query vector by id, a k-means train set, an asof right
            # side) CANNOT run and raising is the documented contract.
            # The axis therefore checks for SILENT WRONG ANSWERS only:
            # a returned result must match the SQL oracle; any raise is
            # acceptable and reported for transparency.
            raised.append((name, f"{type(ex).__name__}: {str(ex)[:80]}"))
        else:
            errs.append((name, f"{type(ex).__name__}: {str(ex)[:110]}"))
if EMPTY and raised:
    print(f"\n[empty mode] {len(raised)} queries raised (acceptable contract):")
    for n, m in raised:
        print(f"  RAISED {n}: {m}")
print(f"\nOK {ok}; VALUE/ROW MISMATCH {len(bad)}; ERRORS {len(errs)}")
for n, m in bad: print(f"  MISMATCH {n}: {m}")
for n, m in errs: print(f"  ERROR {n}: {m}")
ray.shutdown()
import sys as _s
_s.exit(1 if (bad or errs) else 0)
