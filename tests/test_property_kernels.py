"""Property-based tests (hypothesis) over the pure numpy kernels that
every distributed stage is built from. Ray-free — these probe kernel
algebra (the part a distributed run can't easily randomize), mirroring
the reference's property-test strategy (SURVEY.md §5).
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from temporalscope_ray.stages.dedup import _explode_hash_chunks, _hamming_le
from temporalscope_ray.stages.grouped import entity_segments, hash_key_column
from temporalscope_ray.stages.window_features import _seg_shift, _segment_ids

# keep example counts modest: each example is cheap but CI time matters
FAST = settings(max_examples=60, deadline=None)


# ---------------------------------------------------------------------------
# per-entity shift kernel == pandas groupby().shift()
# ---------------------------------------------------------------------------

@st.composite
def keyed_values(draw):
    n = draw(st.integers(min_value=0, max_value=120))
    keys = draw(st.lists(st.integers(min_value=0, max_value=5), min_size=n, max_size=n))
    vals = draw(st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=n, max_size=n))
    return np.sort(np.array(keys, dtype=np.int64)), np.array(vals, dtype=np.float64)


@FAST
@given(keyed_values(), st.integers(min_value=-4, max_value=4))
def test_seg_shift_matches_pandas(kv, k):
    keys, vals = kv
    seg_id = _segment_ids(entity_segments(keys))
    got = _seg_shift(vals, seg_id, k)
    exp = pd.Series(vals).groupby(keys).shift(k).to_numpy()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    np.testing.assert_allclose(got[~np.isnan(got)], exp[~np.isnan(exp)])


@FAST
@given(keyed_values())
def test_segment_ids_monotone_and_boundary_exact(kv):
    keys, _ = kv
    seg_id = _segment_ids(entity_segments(keys))
    assert len(seg_id) == len(keys)
    if len(keys):
        # same key <-> same segment ordinal; ordinals increase with key runs
        changes = keys[1:] != keys[:-1]
        np.testing.assert_array_equal(seg_id[1:] != seg_id[:-1], changes)
        assert seg_id[0] == 0


# ---------------------------------------------------------------------------
# vectorized Hamming verify == per-pair popcount brute force
# ---------------------------------------------------------------------------

@FAST
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=40),
    st.integers(min_value=0, max_value=10),
)
def test_hamming_le_matches_bruteforce(hashes, threshold):
    sims = np.array(hashes, dtype=np.int64).view(np.uint64) if hashes else np.array([], dtype=np.uint64)
    got = _hamming_le(sims, threshold)
    n = len(sims)
    exp = np.zeros(n, dtype=bool)
    for i in range(n):
        for j in range(i):
            if bin(int(sims[i]) ^ int(sims[j])).count("1") <= threshold:
                exp[i] = True
                break
    np.testing.assert_array_equal(got, exp)


# ---------------------------------------------------------------------------
# 4x16 chunk explode: chunks reassemble the hash; pigeonhole completeness
# ---------------------------------------------------------------------------

@FAST
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=30))
def test_explode_hash_chunks_reconstructs(hashes):
    b = pd.DataFrame({"id": np.arange(len(hashes)), "h": pd.array(hashes, dtype="Int64")})
    out = _explode_hash_chunks(b, "h", "id")
    assert len(out) == 4 * len(hashes)
    for i, h in enumerate(hashes):
        rows = out[out["id"] == i].sort_values("chunk_id")
        rebuilt = np.uint64(0)
        for cid, cval in zip(rows["chunk_id"], rows["chunk_val"]):
            rebuilt |= np.uint64(np.uint32(cval)) << np.uint64(16 * int(cid))
        assert rebuilt == np.array([h], dtype=np.int64).view(np.uint64)[0]
        assert (rows["simhash"].to_numpy() == np.int64(h)).all()


@FAST
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
def test_chunk_banding_pigeonhole_complete_at_3(h, flip_bits):
    """Any pair within Hamming distance <= 3 shares at least one intact
    16-bit chunk — the exactness guarantee phash/simhash dedup rely on."""
    hu = np.array([h], dtype=np.int64).view(np.uint64)[0]
    other = hu
    for bit in flip_bits:
        other ^= np.uint64(1) << np.uint64(bit)
    shared = any(
        (hu >> np.uint64(16 * c)) & np.uint64(0xFFFF) == (other >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        for c in range(4)
    )
    assert shared


# ---------------------------------------------------------------------------
# bucket hashing: deterministic, in-range, type-stable
# ---------------------------------------------------------------------------

@FAST
@given(
    st.lists(st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.text(max_size=12)),
             min_size=0, max_size=50),
    st.integers(min_value=1, max_value=64),
)
def test_hash_key_column_deterministic_in_range(vals, nb):
    # mixed int/str lists become object Series — allowed input shape
    a = hash_key_column(pd.Series(vals, dtype=object), nb)
    b = hash_key_column(pd.Series(vals, dtype=object), nb)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.int32
    if len(vals):
        assert a.min() >= 0 and a.max() < nb
        # equal values always land in the same bucket
        df = pd.DataFrame({"v": pd.Series(vals, dtype=object), "b": a})
        assert (df.groupby("v", sort=False)["b"].nunique() == 1).all()


# ---------------------------------------------------------------------------
# round-2 kernels: md5 key-units, session ids, rolling min/max, std
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=80, unique=True),
       st.text(alphabet="abcdef", max_size=4))
@FAST
def test_key_units_deterministic_uniform_range(keys, salt):
    from temporalscope_ray.stages.sampling import _key_units

    s = pd.Series(keys)
    a = _key_units(s, salt=salt, portable=True)
    b = _key_units(s, salt=salt, portable=True)
    assert (a == b).all() and a.dtype == np.uint64
    # distinct keys -> distinct hashes (md5, 64-bit, tiny inputs)
    assert len(np.unique(a)) == len(keys)
    # salt changes the draw
    if keys and salt != "x":
        c = _key_units(s, salt="x", portable=True)
        assert (a != c).any()


@given(keyed_values())
@FAST
def test_seg_session_ids_prefix_laws(kv):
    from temporalscope_ray.stages.window_features import _seg_session_ids

    keys, vals = kv
    ts = np.cumsum(np.abs(vals) + 1.0)  # strictly increasing within array
    segs = entity_segments(keys)
    sid = _seg_session_ids(ts, segs, gap=50.0)
    if len(keys) == 0:
        return
    # session ids start at 0 per entity and never jump by more than 1
    for s, e in zip(segs[:-1], segs[1:]):
        assert sid[s] == 0
        d = np.diff(sid[s:e])
        assert ((d == 0) | (d == 1)).all()


@given(keyed_values(), st.integers(min_value=1, max_value=12))
@FAST
def test_seg_rolling_minmax_matches_pandas(kv, window):
    from temporalscope_ray.stages.window_features import _seg_rolling_minmax

    keys, vals = kv
    if len(keys) == 0:
        return
    seg_id = _segment_ids(entity_segments(keys))
    got = _seg_rolling_minmax(vals, seg_id, window, "max")
    exp = pd.Series(vals).groupby(seg_id).rolling(window, min_periods=1) \
        .max().reset_index(level=0, drop=True).to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@given(keyed_values(), st.integers(min_value=2, max_value=10))
@FAST
def test_seg_rolling_std_matches_pandas(kv, window):
    from temporalscope_ray.stages.window_features import _seg_rolling, _seg_rolling_std

    keys, vals = kv
    if len(keys) == 0:
        return
    segs = entity_segments(keys)
    seg_start = np.repeat(segs[:-1], np.diff(segs))
    vc = vals - vals.mean() if len(vals) else vals
    sx, cnt = _seg_rolling(vc, seg_start, window, 1)
    sxx, _ = _seg_rolling(vc * vc, seg_start, window, 1)
    got = _seg_rolling_std(vc, sx, sxx, cnt, 1)
    exp = pd.Series(vals).groupby(_segment_ids(segs)).rolling(window, min_periods=1) \
        .std().reset_index(level=0, drop=True).to_numpy()
    # the kernel's documented precision contract: |err| <= offset·√(2nε)
    # where offset is the centered window level (bounded by max |vc|)
    offset = np.abs(vc).max() if len(vc) else 0.0
    tol = max(1e-9, offset * np.sqrt(2 * window * 2.3e-16) * 4)
    assert np.allclose(got, exp, equal_nan=True, atol=tol)


# ---------------------------------------------------------------------------
# rolling distinct-count kernel == brute-force window sets
# ---------------------------------------------------------------------------

@st.composite
def keyed_codes(draw):
    n = draw(st.integers(min_value=0, max_value=100))
    keys = draw(st.lists(st.integers(min_value=0, max_value=4), min_size=n, max_size=n))
    codes = draw(st.lists(st.integers(min_value=-1, max_value=3),  # -1 = null
                          min_size=n, max_size=n))
    return (np.sort(np.array(keys, dtype=np.int64)),
            np.array(codes, dtype=np.int64))


@FAST
@given(keyed_codes(), st.integers(min_value=1, max_value=6))
def test_rolling_distinct_codes_matches_bruteforce(kc, window):
    from temporalscope_ray.stages.window_features import _rolling_distinct_codes

    keys, codes = kc
    seg_id = _segment_ids(entity_segments(keys))
    got = _rolling_distinct_codes(codes, seg_id, window)
    want = []
    for i in range(len(codes)):
        win = [codes[j] for j in range(max(0, i - window + 1), i + 1)
               if seg_id[j] == seg_id[i] and codes[j] >= 0]
        want.append(len(set(win)))
    np.testing.assert_array_equal(got, np.array(want, dtype=np.int64))


# ---------------------------------------------------------------------------
# decayed-sum kernel == brute-force weighted window (and exact term order)
# ---------------------------------------------------------------------------

@st.composite
def keyed_timed_values(draw):
    n = draw(st.integers(min_value=0, max_value=80))
    keys = draw(st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n))
    # per-row time increments keep timestamps sorted within the frame
    incs = draw(st.lists(st.integers(min_value=0, max_value=10**9),
                         min_size=n, max_size=n))
    vals = draw(st.lists(
        st.one_of(st.just(float("nan")),
                  st.floats(min_value=-1e3, max_value=1e3, allow_nan=False)),
        min_size=n, max_size=n))
    keys = np.sort(np.array(keys, dtype=np.int64))
    ts = np.cumsum(np.array(incs, dtype=np.float64))
    return keys, ts, np.array(vals, dtype=np.float64)


@FAST
@given(keyed_timed_values(), st.integers(min_value=1, max_value=5))
def test_decayed_sum_matches_bruteforce(ktv, window):
    from temporalscope_ray.stages.window_features import _decayed_sum

    keys, tf, vals = ktv
    lam = 1e-9
    seg_id = _segment_ids(entity_segments(keys))
    got = _decayed_sum(tf, vals, seg_id, lam, window)
    want = np.zeros(len(vals))
    for i in range(len(vals)):
        acc = 0.0 if np.isnan(vals[i]) else vals[i]
        for k in range(1, window):
            j = i - k
            if j < 0 or seg_id[j] != seg_id[i] or np.isnan(vals[j]):
                continue
            acc += np.exp(-lam * (tf[i] - tf[j])) * vals[j]
        want[i] = acc
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
