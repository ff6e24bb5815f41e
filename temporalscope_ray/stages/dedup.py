"""Deduplication family for web-scale corpora: exact, MinHash+LSH,
SimHash, perceptual-hash (phash), n-gram Jaccard, embedding-cosine
near-dup, plus corpus-level line dedup (the C4 rule) and the
cross-corpus contamination probe.

Canonical semantics (direct-pair, deterministic, order-free): a row is
DROPPED iff some verified duplicate partner with a SMALLER ``id_col``
exists; equivalently the smallest id of every duplicate group
survives. All variants share the scale shape:

  vectorized signature ``map_batches``  →  explode to (bucket, id)
  →  ``groupby(bucket)`` (the only full shuffle)  →  per-bucket
  candidate links / pairs  →  tiny DROPPED-id set  →  broadcast
  anti-join filter (``semi_join(anti=True)``).

The filtered side is the DROPPED set — the small side of a dedup
(near-dups are a few % of a corpus) — so nothing survivor-sized is
ever materialized on the driver; above a size threshold ``semi_join``
switches to its bucketed path automatically. Verified variants
(SimHash/Jaccard/embedding) generate candidate PAIRS first and verify
them against a broadcast payload of ONLY the candidate rows — raw
text / vectors never ride the LSH shuffle (round-1 shipped text
×bands; candidates ≪ corpus is the documented bound).

``portable=True`` switches token/shingle hashing from the fast
``pd.util.hash_array`` to md5-lower-64 — bit-identical to DuckDB's
``md5_number_lower`` — so an external SQL engine can replicate
MinHash/SimHash signatures exactly for cross-engine verification
(the driver's oracle gate). Production default stays ``fast``.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

# Portable ASCII word class (== RE2 \w+) — keep in sync with
# stages.text.ASCII_WORD_RE (defined here too to avoid an import cycle:
# text lazily imports dedup's md5 helper). Python's bare \w is
# unicode-aware; RE2's is not, and the minhash/jaccard oracles replay
# tokenization in SQL, so the classes must match byte-for-byte.
ASCII_WORD_RE = r"[A-Za-z0-9_]+"

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .asof import semi_join
from .grouped import cheap_row_count, clamp_concurrency


def _exploded_rows_hint(ds: ray.data.Dataset, per_row: int) -> Optional[int]:
    """Upper bound on an explosion's row count from a FREE input count
    (None when the count isn't metadata-cheap → distributed path)."""
    n = cheap_row_count(ds)
    return None if n is None else n * per_row

_MERSENNE = (1 << 61) - 1
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# MD5 round constants / shifts / message schedule (RFC 1321) for the
# vectorized implementation below.
_MD5_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2.0**32).astype(
    np.uint64).astype(np.uint32)
_MD5_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
                  + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.int64)
_MD5_G = np.array([i for i in range(16)] + [(5 * i + 1) % 16 for i in range(16, 32)]
                  + [(3 * i + 5) % 16 for i in range(32, 48)]
                  + [(7 * i) % 16 for i in range(48, 64)], dtype=np.intp)
# Import-time guard (ADVICE r4): _MD5_K derives from libm sin/floor; a
# 1-ulp platform difference at a floor boundary would SILENTLY break
# md5 parity (and the DuckDB md5_number_lower oracle contract) for
# every portable hash. Pin the first/last constants to the RFC 1321
# table and cross-check the full derivation against hashlib so a bad
# table fails loudly at import, not as a wrong split downstream.
assert _MD5_K[0] == 0xD76AA478 and _MD5_K[63] == 0xEB86D391, "MD5 K-table derivation broken"
assert int(_MD5_K.astype(np.uint64).sum()) == 0x2927F3A0BC, "MD5 K-table checksum mismatch"


def _md5_lower64(strings) -> np.ndarray:
    """md5 lower 64 bits, little-endian — DuckDB ``md5_number_lower``
    parity (verified byte-for-byte against hashlib in tests).

    Vectorized across messages: the per-row ``hashlib.md5`` loop this
    replaces was the 100 TB-hostile part of the portable sampling path
    (VERDICT r3 "What's wrong" #1). The input (list, Series, or numpy
    array of str) converts ONCE through an Arrow large_string array —
    contiguous UTF-8 bytes + int64 offsets, no per-string Python work —
    then messages bucket by padded block count (split/sample keys are
    short decimal strings → one 64-byte block), bytes scatter into an
    (n, blocks·64) uint8 matrix with one flat fancy-index write, and
    the 64 MD5 steps run as allocation-free uint32 ufuncs over ALL
    messages of a bucket at once. Buckets too small to amortize ufunc
    dispatch (<1024 messages) or too long to beat C md5 (>4 blocks,
    i.e. >247 bytes) fall back to the hashlib loop — same output
    either way, so ``portable=True`` stays SQL-replayable."""
    arr = pa.array(strings, type=pa.large_string())
    n = len(arr)
    if n == 0:
        return np.array([], dtype=np.uint64)
    if arr.null_count:
        raise ValueError("_md5_lower64: null keys are not hashable")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=n + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    nblocks = (lens + 9 + 63) // 64
    out = np.empty(n, dtype=np.uint64)

    def _hashlib_fill(idx: np.ndarray) -> None:
        import hashlib
        db = data.tobytes()
        for i in idx:
            dig = hashlib.md5(db[offsets[i]:offsets[i + 1]]).digest()
            out[i] = int.from_bytes(dig[8:16], "little")

    for nb in np.unique(nblocks):
        idx = np.nonzero(nblocks == nb)[0]
        m = len(idx)
        if m < 1024 or nb > 4:
            _hashlib_fill(idx)
            continue
        L = lens[idx]
        width = int(nb) * 64
        buf = np.zeros((m, width), dtype=np.uint8)
        rows = np.repeat(np.arange(m), L)
        # pos = 0..L_i-1 within each message, built without a Python loop
        pos = np.arange(int(L.sum())) - np.repeat(np.cumsum(L) - L, L)
        buf.ravel()[rows * width + pos] = data[pos + np.repeat(offsets[idx], L)]
        buf[np.arange(m), L] = 0x80
        # trailing 8 bytes = bit length, little-endian: one u64 store
        buf.view("<u8").reshape(m, width // 8)[:, -1] = L.astype(np.uint64) * np.uint64(8)
        # words transposed to (blocks, 16, m): M[g] is then a contiguous
        # row, and all round ops write into preallocated scratch — the
        # loop is 64 steps of allocation-free uint32 ufuncs over the
        # whole bucket (ALU-bound, ~4-5x the per-row hashlib loop).
        words = np.ascontiguousarray(
            np.ascontiguousarray(buf).view("<u4").reshape(m, int(nb), 16)
            .transpose(1, 2, 0))
        a = np.full(m, 0x67452301, dtype=np.uint32)
        b = np.full(m, 0xEFCDAB89, dtype=np.uint32)
        c = np.full(m, 0x98BADCFE, dtype=np.uint32)
        d = np.full(m, 0x10325476, dtype=np.uint32)
        F = np.empty(m, dtype=np.uint32)
        t1 = np.empty(m, dtype=np.uint32)
        t2 = np.empty(m, dtype=np.uint32)
        for blk in range(int(nb)):
            M = words[blk]
            A, B, C, D = a.copy(), b.copy(), c.copy(), d.copy()
            for i in range(64):
                if i < 16:
                    np.bitwise_not(B, out=F)
                    np.bitwise_and(F, D, out=F)
                    np.bitwise_and(B, C, out=t1)
                    np.bitwise_or(F, t1, out=F)
                elif i < 32:
                    np.bitwise_not(D, out=F)
                    np.bitwise_and(F, C, out=F)
                    np.bitwise_and(D, B, out=t1)
                    np.bitwise_or(F, t1, out=F)
                elif i < 48:
                    np.bitwise_xor(B, C, out=F)
                    np.bitwise_xor(F, D, out=F)
                else:
                    np.bitwise_not(D, out=F)
                    np.bitwise_or(B, F, out=F)
                    np.bitwise_xor(C, F, out=F)
                np.add(A, F, out=t1)
                np.add(t1, _MD5_K[i], out=t1)
                np.add(t1, M[_MD5_G[i]], out=t1)
                s = int(_MD5_S[i])
                np.left_shift(t1, np.uint32(s), out=F)
                np.right_shift(t1, np.uint32(32 - s), out=t2)
                np.bitwise_or(F, t2, out=F)
                np.add(B, F, out=t1)
                A, D, C, B, t1 = D, C, B, t1, A
            np.add(a, A, out=a)
            np.add(b, B, out=b)
            np.add(c, C, out=c)
            np.add(d, D, out=d)
        out[idx] = c.astype(np.uint64) | (d.astype(np.uint64) << np.uint64(32))
    return out


def hash_strings64(strings: list[str], portable: bool = False) -> np.ndarray:
    """Deterministic vectorized 64-bit string hashing.

    fast (default): ``pd.util.hash_array`` — fixed key, stable across
    processes, C-speed. portable: md5-lower-64, replicable by any SQL
    engine with an md5 function (slower; verification runs only)."""
    if not strings:
        return np.array([], dtype=np.uint64)
    if portable:
        return _md5_lower64(strings)
    return pd.util.hash_array(np.asarray(strings, dtype=object))


def _token_hashes(text: str, token_re: re.Pattern, portable: bool = False) -> np.ndarray:
    return hash_strings64(token_re.findall(text.lower()), portable)


# fixed odd constants for positional shingle mixing (deterministic)
_SHINGLE_C = (np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)


def shingle_hashes(text: str, k: int, token_re: re.Pattern, portable: bool = False) -> np.ndarray:
    """k-token shingles -> uint64 hashes (vector per doc).

    fast: tokens hash once (C-speed), then each shingle is a
    position-weighted wrap-around combination of its k token hashes via
    a sliding window — no per-shingle string joins. portable: each
    shingle is the space-joined token window hashed with md5-lower-64
    (exactly ``md5_number_lower(array_to_string(tokens[i:i+k-1], ' '))``
    in DuckDB)."""
    toks = token_re.findall(text.lower())
    n = len(toks)
    if n == 0:
        return np.array([], dtype=np.uint64)
    if portable:
        if n < k:
            return _md5_lower64([" ".join(toks)])
        return _md5_lower64([" ".join(toks[i : i + k]) for i in range(n - k + 1)])
    th = hash_strings64(toks)
    if n < k:
        window = th[None, :]
        coef = _SHINGLE_C[:n]
    else:
        window = np.lib.stride_tricks.sliding_window_view(th, k)
        coef = _SHINGLE_C[:k]
    return (window * coef[None, :]).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------------------
# shared canonicalization machinery
# ---------------------------------------------------------------------------

def _coarse_bucketed(exploded: ray.data.Dataset, group_cols: Sequence[str], num_buckets: int):
    """Hash-coarsen fine LSH groups into ``num_buckets`` shuffle buckets
    (every fine group lands wholly in one bucket). Ray's
    ``groupby(fine_key).map_groups`` costs one Python call per group —
    catastrophic at ~1 group per row — so the shuffle key is the coarse
    bucket and fine groups are handled vectorized inside."""
    group_cols = list(group_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        df_keys = t.select(group_cols).to_pandas()
        h = pd.util.hash_pandas_object(df_keys, index=False).to_numpy()
        out = t.append_column("__gbucket__", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))
        # strip from_pandas schema metadata: blocks from pandas and
        # pyarrow producers would otherwise reach the sort with
        # "different" schemas (and the unhashable-metadata warning)
        return out.replace_schema_metadata(None)

    return exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)


def _dropped_via_buckets(
    exploded: ray.data.Dataset,
    *,
    id_col: str,
    group_cols: Sequence[str],
    num_buckets: int = 64,
    total_rows: Optional[int] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Unverified bucket-min link: a row is dropped iff a SMALLER id
    shares some fine group with it. Returns the dropped-id Dataset
    (small side), possibly with an id repeated across buckets (≤ the
    band count) — downstream ``semi_join`` key-set semantics are
    duplicate-tolerant.

    ONE shuffle total: "global min partner < id" ⟺ "some bucket-local
    min partner < id", so each bucket emits its locally-dropped ids
    directly and no per-id global reduction (a second all-to-all) is
    needed. ``total_rows`` (an UPPER BOUND on the exploded row count,
    e.g. input docs × bands from a metadata-only count) at or under
    ``single_task_threshold`` skips even that one shuffle — the same
    kernel over the whole coalesced table (one coarse bucket), the
    ``grouped_ordered_map`` small-input pattern."""
    group_cols = list(group_cols)

    def links(g: pd.DataFrame) -> pd.DataFrame:
        canon = g.groupby(group_cols, sort=False)[id_col].transform("min")
        return g.loc[canon.to_numpy() < g[id_col].to_numpy(), [id_col]].drop_duplicates()

    if total_rows is not None and 0 <= total_rows <= single_task_threshold:
        return exploded.repartition(1).map_batches(
            links, batch_size=None, batch_format="pandas"
        )
    bucketed = _coarse_bucketed(exploded, group_cols, num_buckets)
    return bucketed.groupby("__gbucket__").map_groups(
        lambda g: links(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )


def _candidate_pairs(
    exploded: ray.data.Dataset,
    *,
    id_col: str,
    group_cols: Sequence[str],
    num_buckets: int = 64,
    max_group: int = 4096,
    total_rows: Optional[int] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Candidate pairs ``(id_a < id_b)`` from an exploded
    (group_key..., id) table: fine groups of size >= 2 emit all ordered
    pairs. Groups above ``max_group`` members are truncated to the
    ``max_group`` smallest ids (logged via a warning column-free print)
    — an explicit cap, not a silent one; a fine LSH group that large
    means the banding parameters are too coarse for the corpus.
    ``total_rows``: see ``_dropped_via_buckets`` (same small-input
    single-task gate)."""
    group_cols = list(group_cols)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # only fine groups with >= 2 members can produce pairs
        sizes = g.groupby(group_cols, sort=False)[id_col].transform("size")
        g2 = g[sizes >= 2]
        if not len(g2):
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64), "id_b": np.array([], dtype=np.int64)})
        out_a, out_b = [], []
        for _, sub in g2.groupby(group_cols, sort=False):
            ids = np.unique(sub[id_col].to_numpy())
            if len(ids) > max_group:
                print(
                    f"temporalscope_ray.dedup: LSH group truncated {len(ids)} -> {max_group} "
                    "(banding too coarse for corpus size)"
                )
                ids = ids[:max_group]
            m = len(ids)
            if m < 2:
                continue
            iu = np.triu_indices(m, k=1)
            out_a.append(ids[iu[0]])
            out_b.append(ids[iu[1]])
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], dtype=np.int64), "id_b": np.array([], dtype=np.int64)})
        df = pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})
        return df.drop_duplicates(ignore_index=True)

    if total_rows is not None and 0 <= total_rows <= single_task_threshold:
        return exploded.repartition(1).map_batches(
            pairs, batch_size=None, batch_format="pandas"
        )
    bucketed = _coarse_bucketed(exploded, group_cols, num_buckets)
    return bucketed.groupby("__gbucket__").map_groups(
        lambda g: pairs(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )


def _payload_map_for_candidates(
    ds: ray.data.Dataset,
    pairs_df: pd.DataFrame,
    *,
    id_col: str,
    payload_fn,
    payload_cols: Sequence[str],
    max_candidates: int = 5_000_000,
) -> "ray.ObjectRef":
    """Broadcast {id -> payload} for ONLY the candidate ids: a
    semi-join narrows the corpus to the candidate rows (ids from the
    pair list — the small side), ``payload_fn(batch) -> dict[id, obj]``
    computes the per-row verification payloads distributed, and the
    merged map goes to the object store once (``ray.put``).

    The candidate set must stay object-store-sized: past
    ``max_candidates`` distinct ids this raises LOUDLY instead of
    silently building an unbounded driver dict (round-2 verdict watch
    item) — a corpus that dense in near-dup candidates needs coarser
    banding (raise band width / ``max_group``) or a pre-pass exact
    dedup, both of which shrink the pair list upstream."""
    cand_ids = np.unique(np.concatenate([pairs_df["id_a"].to_numpy(), pairs_df["id_b"].to_numpy()])) if len(pairs_df) else np.array([], dtype=np.int64)
    if len(cand_ids) > max_candidates:
        raise ValueError(
            f"near-dup verification candidate set has {len(cand_ids)} distinct ids, "
            f"over the broadcast bound max_candidates={max_candidates}; banding is too "
            "fine for this corpus — widen bands/num_perm bands, lower max_group, or "
            "run exact dedup first to shrink the candidate pair list"
        )
    cand = semi_join(ds.select_columns(list(dict.fromkeys([id_col, *payload_cols]))), cand_ids.tolist(), id_col)
    maps = cand.map_batches(
        lambda b: pd.DataFrame({"__pickle__": [payload_fn(b)]}), batch_format="pandas", batch_size=4096
    ).to_pandas()
    merged: dict = {}
    for m in maps["__pickle__"]:
        merged.update(m)
    return ray.put(merged)


def _anti_join_dropped(ds: ray.data.Dataset, dropped: ray.data.Dataset | Sequence, id_col: str) -> ray.data.Dataset:
    return semi_join(ds, dropped, id_col, anti=True)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    content_cols: Sequence[str],
) -> ray.data.Dataset:
    """Exact dedup on content: hash the content columns per batch
    (vectorized), hash-partition on the digest, keep the min-id row per
    digest group, then semi-join the survivors back (``semi_join``
    auto-switches to its bucketed path when the survivor set exceeds
    the broadcast threshold — nothing corpus-sized ever lands on the
    driver)."""

    def _remix(df: pd.DataFrame) -> pd.DataFrame:
        """Value-level perturbation so the second digest is INDEPENDENT
        of the first: pandas' ``hash_key`` only alters string/object
        hashing, so for numeric/datetime columns the bit pattern must be
        remixed BEFORE hashing or h2 == h1 row-for-row and the combined
        digest is effectively 64-bit."""
        out = {}
        c1 = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as two's complement
        for c in df.columns:
            arr = df[c].to_numpy()
            if arr.dtype.kind == "f" and arr.dtype.itemsize == 8:
                out[c] = pd.Series(arr.view(np.int64) ^ c1)
            elif arr.dtype.kind in "iub" and arr.dtype.itemsize <= 8:
                out[c] = pd.Series(arr.astype(np.int64, copy=False) ^ c1)
            elif arr.dtype.kind in "Mm":
                out[c] = pd.Series(arr.view(np.int64) ^ c1)
            elif arr.dtype.kind == "f":
                out[c] = pd.Series(arr.astype(np.float64).view(np.int64) ^ c1)
            else:
                out[c] = df[c]  # strings/objects: hash_key below differentiates
        return pd.DataFrame(out)

    def add_digest(batch: pa.Table) -> pa.Table:
        df = batch.select(list(content_cols)).to_pandas()
        # two independent 64-bit hashes -> effective 128-bit digest;
        # birthday-bound collision odds stay negligible (~1e-20 at 4B
        # rows), where a single 64-bit digest would silently merge
        # distinct rows at web scale
        h1 = pd.util.hash_pandas_object(df, index=False).astype("int64")
        h2 = pd.util.hash_pandas_object(_remix(df), index=False, hash_key="1b893793ce274cce").astype("int64")
        batch = batch.append_column("__digest1__", pa.array(h1.to_numpy()))
        return batch.append_column("__digest2__", pa.array(h2.to_numpy()))

    digested = ds.map_batches(add_digest, batch_format="pyarrow", zero_copy_batch=True)
    from .grouped import hash_groupby_aggregate

    survivors = hash_groupby_aggregate(
        digested.select_columns(["__digest1__", "__digest2__", id_col]),
        ["__digest1__", "__digest2__"],
        {id_col: (id_col, "min")},
    )
    keep_ids = survivors.select_columns([id_col])
    return semi_join(ds, keep_ids, id_col, assume_unique=True)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor: permutation parameters generated ONCE per actor from a
    fixed seed; per batch computes num_perm minhashes per doc and
    explodes them into (band_id, band_hash, id) rows — nothing but ids
    and band keys ride the shuffle."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int, shingle_k: int, seed: int,
                 portable: bool = False):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.rows_per_band = num_perm // bands
        self.num_perm, self.bands = num_perm, bands
        self.text_col, self.id_col, self.k = text_col, id_col, shingle_k
        self.portable = portable
        self.token_re = re.compile(ASCII_WORD_RE)

    def signature(self, text: str) -> Optional[np.ndarray]:
        sh = shingle_hashes(text, self.k, self.token_re, self.portable)
        if len(sh) == 0:
            return None
        # (a*x + b) mod p, min over shingles, vectorized (num_perm × n).
        # NOTE the uint64 product wraps mod 2^64 BEFORE the mod-p — the
        # portable SQL replication applies the same wrap explicitly.
        prod = (self.a[:, None] * (sh[None, :] % _MERSENNE)) % _MERSENNE
        return ((prod + self.b[:, None]) % _MERSENNE).min(axis=1)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """All band hashes at once: reshape (bands, rows_per_band),
        multiply-mod by the first rows_per_band permutation params, and
        XOR-reduce along the band axis — one vectorized op, not a
        Python loop per band. (Band-hash equality stands in for
        band-tuple equality; collision odds ~2^-61.)"""
        chunks = sig.reshape(self.bands, self.rows_per_band)
        mixed = (chunks * self.a[None, : self.rows_per_band]) % _MERSENNE
        return np.bitwise_xor.reduce(mixed, axis=1) % _MERSENNE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes = [], [], []
        band_range = np.arange(self.bands, dtype=np.int32)
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.signature(text)
            if sig is None:
                # no shingles (empty/punctuation-only text): not a
                # near-dup of anything — emit NOTHING. The dropped-side
                # semantics make absence safe (a doc with no bucket rows
                # can never be dropped, so it survives the anti-join);
                # emitting an id-keyed singleton bucket instead would
                # add a hash-collision class between singleton keys.
                continue
            bh = self.band_hashes(sig)
            ids.extend([doc_id] * self.bands)
            band_ids.append(band_range)
            band_hashes.append(bh.astype(np.int64))
        return pd.DataFrame({
            self.id_col: ids,
            "band_id": np.concatenate(band_ids) if band_ids else np.array([], dtype=np.int32),
            "band_hash": np.concatenate(band_hashes) if band_hashes else np.array([], dtype=np.int64),
        })


def _minhash_exploded(ds, *, text_col, id_col, num_perm, bands, shingle_k, seed, concurrency, portable=False):
    # explicit batch_size: signature compute is ~300 µs/doc, so a
    # 128 MB parquet block (~1M docs) handed to ONE actor as a single
    # batch serializes the pool for minutes — bounded batches keep
    # every actor fed regardless of input block layout (observed: a
    # 2M-doc probe ran ONE 100%-cpu actor while the rest idled).
    return ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        batch_format="pandas",
        batch_size=4096,
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed, portable),
    )


def minhash_dropped(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 7,
    concurrency=8,
    portable: bool = False,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Dropped-id Dataset: ids sharing some LSH band bucket with a
    smaller id (one hop, unverified — MinHash banding IS the match
    criterion). May repeat an id across band buckets; consumers
    (``semi_join``) are duplicate-tolerant."""
    exploded = _minhash_exploded(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, seed=seed, concurrency=concurrency, portable=portable,
    )
    return _dropped_via_buckets(exploded, id_col=id_col, group_cols=["band_id", "band_hash"],
                                total_rows=_exploded_rows_hint(ds, bands),
                                single_task_threshold=single_task_threshold)


def minhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 7,
    concurrency=8,
    portable: bool = False,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Keep rows with no smaller-id band-bucket partner. The filter
    anti-joins the DROPPED set (the small side).

    ``single_task_threshold`` (compared against the exploded-row upper
    bound docs × bands, from a METADATA-ONLY count) gates the
    small-input local path; 0 forces the bucketed exchange — tests pin
    both paths row-identical."""
    dropped = minhash_dropped(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, seed=seed, concurrency=clamp_concurrency(concurrency), portable=portable,
        single_task_threshold=single_task_threshold,
    )
    return _anti_join_dropped(ds, dropped, id_col)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per doc + 4×16-bit chunk bucketing (docs within
    Hamming distance 3 share at least one exact chunk — pigeonhole).
    The 64-bit simhash rides along (8 bytes/chunk row) so buckets
    verify WITHOUT a second lookup."""

    def __init__(self, text_col: str, id_col: str, portable: bool = False):
        self.text_col, self.id_col = text_col, id_col
        self.portable = portable
        self.token_re = re.compile(ASCII_WORD_RE)

    def simhash_from_hashes(self, hashes: np.ndarray) -> int:
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        return int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

    def simhash(self, text: str) -> int:
        hashes = _token_hashes(text, self.token_re, self.portable)
        if len(hashes) == 0:
            return 0
        return self.simhash_from_hashes(hashes)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, chunk_ids, chunk_vals, sims = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            hashes = _token_hashes(text, self.token_re, self.portable)
            if len(hashes) == 0:
                # tokenless doc: emit nothing — dropped-side semantics
                # mean a doc with no chunk rows can never be dropped, so
                # it survives; a singleton bucket keyed by a truncated
                # id hash (the previous scheme) could collide two
                # tokenless docs (both simhash 0 -> verified at
                # Hamming 0) and wrongly delete one.
                continue
            sh = self.simhash_from_hashes(hashes)
            for c in range(4):
                ids.append(doc_id)
                chunk_ids.append(c)
                chunk_vals.append((sh >> (16 * c)) & 0xFFFF)
                # two's-complement int64 view (sh - 2^64, NOT 2^63 —
                # the latter silently corrupts bit 63, a round-1 bug
                # this family's DuckDB oracle caught)
                sims.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        return pd.DataFrame({self.id_col: ids, "chunk_id": chunk_ids, "chunk_val": chunk_vals, "simhash": sims})


def _hamming_le(sims: np.ndarray, threshold: int, block: int = 512) -> np.ndarray:
    """For id-sorted uint64 simhashes: dropped[i] = True iff some j<i
    has popcount(sims[i]^sims[j]) <= threshold. Vectorized byte-table
    popcount, processed in row blocks so memory stays O(block × m)."""
    m = len(sims)
    dropped = np.zeros(m, dtype=bool)
    for s in range(1, m, block):
        e = min(s + block, m)
        x = sims[s:e, None] ^ sims[None, :e]          # (rows, e) uint64
        ham = _POP8[x.view(np.uint8).reshape(e - s, e, 8)].sum(axis=2)
        idx = np.arange(s, e)[:, None]
        close = (ham <= threshold) & (np.arange(e)[None, :] < idx)
        dropped[s:e] |= close.any(axis=1)
    return dropped


def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    hamming_threshold: int = 3,
    concurrency=8,
    portable: bool = False,
    num_buckets: Optional[int] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Candidates share a 16-bit chunk; verified by vectorized Hamming
    distance on the full 64-bit simhash inside the bucket (byte-table
    popcount — no per-pair Python); a row drops iff a smaller-id row
    within distance ``hamming_threshold`` shares a chunk."""
    from .grouped import resolve_num_buckets as _rnb
    # no explosion factor despite the 4x chunk banding: the exchange
    # carries only (id, chunk, hash) rows (~40 B x 4 per doc) while the
    # input bytes priced by the sizer INCLUDE the text that never moves
    # — input-byte sizing already overestimates, the safe direction
    num_buckets = _rnb(ds, num_buckets)
    # bounded batches: per-doc token hashing is heavy (same hazard as
    # MinHasher — one fat parquet block handed to one actor as a single
    # batch serializes the pool; see _minhash_exploded)
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher, batch_format="pandas", batch_size=4096,
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(text_col, id_col, portable),
    )
    dropped = _dropped_hamming(exploded, id_col=id_col, threshold=hamming_threshold,
                               num_buckets=num_buckets,
                               total_rows=_exploded_rows_hint(ds, 4),
                               single_task_threshold=single_task_threshold)
    return _anti_join_dropped(ds, dropped, id_col)


def _dropped_hamming(
    exploded: ray.data.Dataset, *, id_col: str, threshold: int, num_buckets: int,
    total_rows: Optional[int] = None, single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Shared verify for 64-bit-hash chunk banding (simhash / phash):
    within each fine (chunk_id, chunk_val) group, a row drops iff a
    smaller-id row is within ``threshold`` Hamming distance of its full
    64-bit hash. Fine groups ride a hash-coarsened bucket shuffle and
    are verified vectorized (byte-table popcount, row-blocked).
    ``total_rows``: small-input single-task gate, see
    ``_dropped_via_buckets``."""
    group_cols = ["chunk_id", "chunk_val"]

    def bucket_dropped(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(group_cols, sort=False)[id_col].transform("size")
        g2 = g[sizes >= 2]
        out = []
        for _, sub in g2.groupby(group_cols, sort=False):
            sub = sub.sort_values(id_col)
            sims = sub["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            ids = sub[id_col].to_numpy()
            d = _hamming_le(sims, threshold)
            if d.any():
                out.append(ids[d])
        # empty slice of the source column keeps the id dtype stable
        # across buckets (string ids would otherwise flip to int64)
        vals = np.concatenate(out) if out else g[id_col].to_numpy()[:0]
        return pd.DataFrame({id_col: np.unique(vals)})

    if total_rows is not None and 0 <= total_rows <= single_task_threshold:
        return exploded.repartition(1).map_batches(
            bucket_dropped, batch_size=None, batch_format="pandas"
        )
    bucketed = _coarse_bucketed(exploded, group_cols, num_buckets)
    return bucketed.groupby("__gbucket__").map_groups(
        lambda g: bucket_dropped(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )


def _explode_hash_chunks(batch: pd.DataFrame, hash_col: str, id_col: str) -> pd.DataFrame:
    """4×16-bit chunk rows from a precomputed int64 64-bit hash column,
    fully vectorized (null hashes emit no rows — they always survive)."""
    mask = batch[hash_col].notna().to_numpy()
    h64 = batch.loc[mask, hash_col].to_numpy().astype(np.int64)
    hu = h64.view(np.uint64)
    n = len(hu)
    shifts = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
    return pd.DataFrame({
        id_col: np.repeat(batch.loc[mask, id_col].to_numpy(), 4),
        "chunk_id": np.tile(np.arange(4, dtype=np.int8), n),
        "chunk_val": ((np.repeat(hu, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int32),
        "simhash": np.repeat(h64, 4),
    })


def phash_dedup(
    ds: ray.data.Dataset,
    *,
    hash_col: str = "phash",
    id_col: str = "image_id",
    hamming_threshold: int = 3,
    concurrency=8,
    num_buckets: Optional[int] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Near-duplicate removal on a precomputed 64-bit perceptual-hash
    column (the north-rule image table's ``phash:int64``): 4×16-bit
    chunk banding (pigeonhole-exact for ``hamming_threshold`` ≤ 3) +
    vectorized in-bucket Hamming verify; keeps the smallest id of each
    near-dup neighborhood. The image payload (``bytes``) never enters
    the exchange — only (id, chunk, hash) rows move, ~40 bytes/row at
    any payload size. Hot phash clusters (many images sharing a chunk)
    stay within one fine group and are verified by one vectorized
    popcount block scan rather than per-pair Python."""
    from .grouped import resolve_num_buckets as _rnb
    # no explosion factor: only (id, chunk, hash) rows move; the sizer
    # prices the full input (incl. any payload bytes) — overestimates
    num_buckets = _rnb(ds, num_buckets)
    # stateless task-pool explode — the streaming executor sizes it
    exploded = ds.select_columns([id_col, hash_col]).map_batches(
        lambda b: _explode_hash_chunks(b, hash_col, id_col), batch_format="pandas",
    )
    dropped = _dropped_hamming(exploded, id_col=id_col, threshold=hamming_threshold,
                               num_buckets=num_buckets,
                               total_rows=_exploded_rows_hint(ds, 4),
                               single_task_threshold=single_task_threshold)
    return _anti_join_dropped(ds, dropped, id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard verified dedup (two-phase: LSH candidates -> exact verify)
# ---------------------------------------------------------------------------

def jaccard_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
    concurrency=8,
    max_candidates: int = 5_000_000,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs + EXACT n-gram Jaccard verification.

    Two-phase: the LSH shuffle moves only (band_id, band_hash, id);
    candidate pairs come back small (near-dup density + banding false
    positives), ONLY the candidate rows' shingle-hash sets are computed
    and broadcast, and each pair verifies vectorized
    (``np.intersect1d`` on sorted unique shingle hashes). A row drops
    iff a smaller-id partner verifies at >= ``threshold``."""
    exploded = _minhash_exploded(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, seed=seed, concurrency=concurrency,
    )
    # materialize ONCE: the pair list is consumed twice (driver frame
    # for the payload narrowing + the distributed verify pass); without
    # this the whole signature+LSH-shuffle lineage would execute twice
    pairs = _candidate_pairs(exploded, id_col=id_col, group_cols=["band_id", "band_hash"],
                             total_rows=_exploded_rows_hint(ds, bands),
                             single_task_threshold=single_task_threshold).materialize()
    pairs_df = pairs.to_pandas().drop_duplicates(ignore_index=True)  # candidates: small side
    if not len(pairs_df):
        return ds

    token_re_src = ASCII_WORD_RE

    def sig_map(b: pd.DataFrame) -> dict:
        token_re = re.compile(token_re_src)
        return {
            i: np.unique(shingle_hashes(t, shingle_k, token_re))
            for i, t in zip(b[id_col], b[text_col].fillna(""))
        }

    sig_ref = _payload_map_for_candidates(ds, pairs_df, id_col=id_col, payload_fn=sig_map, payload_cols=[text_col], max_candidates=max_candidates)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        sigs: dict = ray.get(sig_ref)
        keep = np.zeros(len(b), dtype=bool)
        for i, (a_id, b_id) in enumerate(zip(b["id_a"], b["id_b"])):
            sa, sb = sigs.get(a_id), sigs.get(b_id)
            if sa is None or sb is None or not len(sa) or not len(sb):
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
                keep[i] = True
        return pd.DataFrame({id_col: b["id_b"].to_numpy()[keep]})

    dropped = pairs.map_batches(verify, batch_format="pandas")
    return _anti_join_dropped(ds, dropped, id_col)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (multi-table hyperplane LSH + exact verify)
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Banded random-hyperplane LSH for unit vectors: ``num_tables``
    independent tables of ``nbits`` sign bits each (fixed-seed Gaussian
    projections). A near-identical pair agrees on all bits of at least
    one table with probability ~1; bucket space per table is 2^nbits —
    size ``nbits ~ log2(corpus)`` so buckets stay small. Emits
    (table_id, bucket, id) only — vectors never ride the shuffle."""

    def __init__(self, emb_col: str, id_col: str, dim: int, nbits: int, num_tables: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_tables, dim, nbits))
        self.emb_col, self.id_col = emb_col, id_col
        self.num_tables, self.nbits = num_tables, nbits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[self.emb_col].to_numpy()).astype(np.float64)
        ids = batch[self.id_col].to_numpy()
        weights = 1 << np.arange(self.nbits, dtype=np.int64)
        parts = []
        for t in range(self.num_tables):
            signs = (mat @ self.planes[t]) > 0
            bucket = signs @ weights
            parts.append(pd.DataFrame({
                self.id_col: ids,
                "table_id": np.full(len(ids), t, dtype=np.int32),
                "bucket": bucket,
            }))
        return pd.concat(parts, ignore_index=True)


def embedding_dedup(
    ds: ray.data.Dataset,
    *,
    emb_col: str,
    id_col: str,
    threshold: float = 0.98,
    nbits: int = 12,
    num_tables: int = 8,
    seed: int = 11,
    concurrency=8,
    max_candidates: int = 5_000_000,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Cosine near-dup, two-phase: banded hyperplane candidate pairs
    (vectors never shuffled), exact pairwise cosine verification over a
    broadcast of ONLY the candidate vectors (vectorized row-wise dot),
    min-id survives."""
    head = ds.take(1)
    if not head:
        return ds  # empty corpus: nothing to dedup
    dim = len(head[0][emb_col])
    exploded = ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneBucketer, batch_format="pandas", batch_size=8192,
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(emb_col, id_col, dim, nbits, num_tables, seed),
    )
    # materialized once: consumed by the driver frame AND the verify pass
    pairs = _candidate_pairs(exploded, id_col=id_col, group_cols=["table_id", "bucket"],
                             total_rows=_exploded_rows_hint(ds, num_tables),
                             single_task_threshold=single_task_threshold).materialize()
    pairs_df = pairs.to_pandas().drop_duplicates(ignore_index=True)
    if not len(pairs_df):
        return ds

    def vec_map(b: pd.DataFrame) -> dict:
        mat = np.stack(b[emb_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return {i: unit[j] for j, i in enumerate(b[id_col])}

    vec_ref = _payload_map_for_candidates(ds, pairs_df, id_col=id_col, payload_fn=vec_map, payload_cols=[emb_col], max_candidates=max_candidates)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        vecs: dict = ray.get(vec_ref)
        if not len(b):
            return pd.DataFrame({id_col: np.array([], dtype=np.int64)})
        a = np.stack([vecs[i] for i in b["id_a"]])
        c = np.stack([vecs[i] for i in b["id_b"]])
        cos = (a * c).sum(axis=1)
        return pd.DataFrame({id_col: b["id_b"].to_numpy()[cos >= threshold]})

    dropped = pairs.map_batches(verify, batch_format="pandas")
    return _anti_join_dropped(ds, dropped, id_col)


def contaminated_ids(
    corpus: ray.data.Dataset,
    reference: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    portable: bool = False,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Decontamination probe: ids of ``corpus`` documents sharing at
    least one ``shingle_k``-token shingle with ANY ``reference``
    document (the eval-set leakage check every pre-training pipeline
    runs before training).

    Shape: both corpora reduce per block to their distinct shingle
    hashes (reference drops ids entirely — its hash SET is all that
    matters), then ONE hash exchange on the shingle hash co-locates
    matches; per bucket a vectorized isin emits the matched corpus
    ids, and a final combiner distinct dedups ids matched in several
    buckets. Nothing ever moves text; the exchange carries only
    (hash, id) / (hash) rows. ``portable=True`` hashes shingles with
    md5-lower-64, replayable in SQL via
    ``md5_number_lower(array_to_string(tokens[i:i+k-1], ' '))``.
    """
    from .grouped import resolve_num_buckets as _rnb
    # explosion factor (ADVICE r4): the exchange carries one (hash64,
    # id) row per token position (~16 B) vs ~6 B/token of input text —
    # exchanged bytes ≈ 3x input; 4 prices the 1 GiB/bucket target on
    # the exchanged volume
    num_buckets = _rnb(corpus, num_buckets, factor=4.0)
    token_re = re.compile(ASCII_WORD_RE)
    from ..core import _schema

    id_type = _schema(corpus).field(id_col).type
    SIDE_COL = "__side__"
    row_schema = pa.schema([("__h__", pa.uint64()), (id_col, id_type), (SIDE_COL, pa.int8())])

    def corpus_hashes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_h, out_id = [], []
        for i, txt in enumerate(texts):
            hs = shingle_hashes(txt or "", shingle_k, token_re, portable)
            if len(hs):
                hs = np.unique(hs)
                out_h.append(hs)
                out_id.append(np.full(len(hs), ids[i], dtype=ids.dtype))
        h = np.concatenate(out_h) if out_h else np.array([], dtype=np.uint64)
        i = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        df = pd.DataFrame({"__h__": h, id_col: i}).drop_duplicates()
        n = len(df)
        return pa.table({
            "__h__": pa.array(df["__h__"].to_numpy(), type=pa.uint64()),
            id_col: pa.array(df[id_col].to_numpy()).cast(id_type),
            SIDE_COL: pa.array(np.zeros(n, dtype=np.int8)),
        }, schema=row_schema)

    def ref_hashes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [shingle_hashes(t or "", shingle_k, token_re, portable) for t in texts]
        hs = [h for h in hs if len(h)]
        flat = np.unique(np.concatenate(hs)) if hs else np.array([], dtype=np.uint64)
        return pa.table({
            "__h__": pa.array(flat, type=pa.uint64()),
            id_col: pa.nulls(len(flat), type=id_type),
            SIDE_COL: pa.array(np.ones(len(flat), dtype=np.int8)),
        }, schema=row_schema)

    ch = corpus.select_columns([id_col, text_col]).map_batches(
        corpus_hashes, batch_format="pyarrow"
    )
    rh = reference.select_columns([text_col]).map_batches(ref_hashes, batch_format="pyarrow")

    from .grouped import BUCKET_COL, hash_groupby_aggregate, hash_key_column

    unioned = ch.union(rh)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash_key_column(t.column("__h__"), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    bucketed = unioned.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
        h = t.column("__h__").to_numpy(zero_copy_only=False)
        ids = t.column(id_col)
        ref_set = h[side == 1]
        corp = side == 0
        hit = corp & np.isin(h, ref_set)
        return pa.table({id_col: ids.filter(pa.array(hit))})

    matched = bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
    distinct = hash_groupby_aggregate(
        matched, [id_col], {"__n__": (None, "count")}, num_buckets=32
    )
    return distinct.select_columns([id_col])


# ---------------------------------------------------------------------------
# corpus-level line dedup (the C4 preprocessing rule)
# ---------------------------------------------------------------------------

def line_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Corpus-level duplicate-line removal (the C4 rule: every line is
    kept only at its FIRST occurrence across the whole corpus, ordered
    by ``(id, line_idx)``); documents are reassembled from their
    surviving lines and documents with zero surviving lines drop.

    Shape: two exchanges, each moving the text exactly ONCE (never
    ×bands). Pass 1 explodes documents to ``(id, line_idx, line)``
    rows and hash-coarsens on the line string, so every occurrence of
    one line lands wholly in one bucket and the global first-occurrence
    rule is decided locally by one vectorized ``duplicated`` scan —
    line equality is exact (grouped on the string inside the bucket),
    not hash-equality, so hash collisions cannot merge distinct lines.
    Pass 2 re-buckets survivors by document id and stitches each
    document back in ``line_idx`` order. No driver-side state at any
    point; a pathological line duplicated across the whole corpus is
    one in-bucket group handled by a single C-speed scan."""
    from .grouped import resolve_num_buckets as _rnb
    # explosion factor: line text rides once but each line adds
    # (doc_id, line_idx, hash) overhead — exchanged ≈ 2x input bytes
    num_buckets = _rnb(ds, num_buckets, factor=2.0)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].fillna("")
        lines = s.str.split(sep)
        n = lines.str.len().to_numpy()
        tot = int(n.sum())
        starts = np.repeat(np.cumsum(n) - n, n)
        flat = (
            np.concatenate([np.asarray(ls, dtype=object) for ls in lines])
            if tot else np.array([], dtype=object)
        )
        return pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(), n),
            "line_idx": (np.arange(tot) - starts).astype(np.int64),
            "line": flat,
        })

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas"
    )
    by_line = _coarse_bucketed(exploded, ["line"], num_buckets)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_idx"], kind="mergesort")
        return g.loc[~g.duplicated("line"), [id_col, "line_idx", "line"]]

    kept = by_line.groupby("__gbucket__").map_groups(
        lambda g: keep_first(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )
    by_doc = _coarse_bucketed(kept, [id_col], num_buckets)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "line_idx"], kind="mergesort")
        agg = g.groupby(id_col, sort=False)["line"].agg(sep.join)
        return pd.DataFrame({id_col: agg.index.to_numpy(), text_col: agg.to_numpy()})

    return by_doc.groupby("__gbucket__").map_groups(
        lambda g: reassemble(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )


def _hamming_pairs_le(sims: np.ndarray, ids: np.ndarray, threshold: int, block: int = 512):
    """All (id_a < id_b) pairs within ``threshold`` Hamming distance,
    for id-sorted uint64 hashes — the pair-emitting sibling of
    ``_hamming_le`` (same byte-table popcount, same row blocking)."""
    m = len(sims)
    out_a, out_b = [], []
    for s in range(0, m, block):
        e = min(s + block, m)
        x = sims[s:e, None] ^ sims[None, :]
        ham = _POP8[x.view(np.uint8).reshape(e - s, m, 8)].sum(axis=2)
        close = (ham <= threshold) & (np.arange(m)[None, :] < np.arange(s, e)[:, None])
        ii, jj = np.nonzero(close)
        out_a.append(ids[jj])          # j < i and ids ascending -> id_a < id_b
        out_b.append(ids[s + ii])
    if not out_a:
        return ids[:0], ids[:0]
    return np.concatenate(out_a), np.concatenate(out_b)


def hamming_pairs(
    ds: ray.data.Dataset,
    *,
    hash_col: str,
    id_col: str,
    threshold: int = 3,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Verified near-duplicate PAIRS on a 64-bit hash column (phash /
    simhash): the same 4×16-bit chunk banding + in-bucket vectorized
    verify as the dedup operators, but emitting the ``(id_a, id_b)``
    edge list instead of dropping rows — the input to duplicate-cluster
    labeling (``graph.connected_components``). Pigeonhole-exact for
    ``threshold`` ≤ 3. A pair sharing several chunks may be emitted by
    several buckets; edges are deduped within a bucket and consumers
    (min-label propagation) are duplicate-edge-tolerant."""
    from .grouped import resolve_num_buckets as _rnb
    num_buckets = _rnb(ds, num_buckets)
    group_cols = ["chunk_id", "chunk_val"]
    exploded = ds.select_columns([id_col, hash_col]).map_batches(
        lambda b: _explode_hash_chunks(b, hash_col, id_col), batch_format="pandas",
    )
    bucketed = _coarse_bucketed(exploded, group_cols, num_buckets)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(group_cols, sort=False)[id_col].transform("size")
        g2 = g[sizes >= 2]
        acc_a, acc_b = [], []
        for _, sub in g2.groupby(group_cols, sort=False):
            sub = sub.sort_values(id_col)
            a, b = _hamming_pairs_le(
                sub["simhash"].to_numpy().astype(np.int64).view(np.uint64),
                sub[id_col].to_numpy(), threshold)
            acc_a.append(a)
            acc_b.append(b)
        empty = g[id_col].to_numpy()[:0]
        out = pd.DataFrame({
            "id_a": np.concatenate(acc_a) if acc_a else empty,
            "id_b": np.concatenate(acc_b) if acc_b else empty,
        })
        return out.drop_duplicates(ignore_index=True)

    return bucketed.groupby("__gbucket__").map_groups(
        lambda g: bucket_pairs(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )


def jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 7,
    concurrency=8,
    max_candidates: int = 5_000_000,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Verified near-duplicate PAIRS by exact n-gram Jaccard — the
    pair-emitting sibling of ``jaccard_dedup`` (identical LSH candidate
    generation + exact shingle-set verify), feeding duplicate-cluster
    labeling (``graph.connected_components``) for the TEXT modality
    the way ``hamming_pairs`` does for the image phash modality."""
    exploded = _minhash_exploded(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, seed=seed, concurrency=concurrency,
    )
    pairs = _candidate_pairs(
        exploded, id_col=id_col, group_cols=["band_id", "band_hash"],
        total_rows=_exploded_rows_hint(ds, bands),
        single_task_threshold=single_task_threshold,
    ).materialize()
    pairs_df = pairs.to_pandas().drop_duplicates(ignore_index=True)
    if not len(pairs_df):
        return pairs.limit(0)

    token_re_src = ASCII_WORD_RE

    def sig_map(b: pd.DataFrame) -> dict:
        token_re = re.compile(token_re_src)
        return {
            i: np.unique(shingle_hashes(t, shingle_k, token_re))
            for i, t in zip(b[id_col], b[text_col].fillna(""))
        }

    sig_ref = _payload_map_for_candidates(
        ds, pairs_df, id_col=id_col, payload_fn=sig_map, payload_cols=[text_col],
        max_candidates=max_candidates,
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        sigs: dict = ray.get(sig_ref)
        keep = np.zeros(len(b), dtype=bool)
        for i, (a_id, b_id) in enumerate(zip(b["id_a"], b["id_b"])):
            sa, sb = sigs.get(a_id), sigs.get(b_id)
            if sa is None or sb is None or not len(sa) or not len(sb):
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
                keep[i] = True
        return b[keep]

    return pairs.map_batches(verify, batch_format="pandas")


def keep_best(
    ds: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    *,
    id_col: str,
    score_col: str,
    cluster_col: str = "cluster_id",
    cluster_id_col: str = "id",
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Quality-aware canonical selection — the step after duplicate
    CLUSTERING that the keep-smallest-id dedups skip: inside every
    cluster keep the row with the HIGHEST ``score_col`` (ties → the
    smallest id; with ``score_col`` = document length this is the
    industry keep-longest rule), plus every row that never entered the
    pair graph. Returns a one-column Dataset of kept ids.

    Shape: the cluster labels join their scores through one bucketed
    exchange; the per-cluster argmax is the ``grouped_mode`` combiner
    pattern (each block reduces to one candidate row per cluster, the
    exchange moves candidates, the final pass re-argmaxes) — winners
    per cluster, never the cluster contents, reach the union. The
    unclustered complement comes from the size-adaptive ``semi_join``
    (anti), so nothing corpus-sized is materialized anywhere.
    """
    from .grouped import resolve_num_buckets as _rnb
    num_buckets = _rnb(ds, num_buckets)
    import pandas as _pd

    from .asof import semi_join
    from .grouped import with_bucket, BUCKET_COL

    lab = clusters.map_batches(
        lambda t: t.rename_columns([id_col, cluster_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .join import equi_join

    scored = equi_join(
        lab, ds.select_columns([id_col, score_col]), on=id_col,
        num_buckets=num_buckets,
    )

    def argmax(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.sort_values([score_col, id_col], ascending=[False, True],
                            kind="mergesort")
        return df.groupby(cluster_col, sort=False).head(1)

    cand = scored.map_batches(argmax, batch_format="pandas")
    bucketed = with_bucket(cand, cluster_col, num_buckets)
    winners = bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: argmax(g.drop(columns=[BUCKET_COL]))[[id_col]],
        batch_format="pandas",
    )
    untouched = semi_join(
        ds.select_columns([id_col]), clusters.select_columns([cluster_id_col]),
        id_col, anti=True,
    ) if cluster_id_col == id_col else semi_join(
        ds.select_columns([id_col]),
        clusters.map_batches(
            lambda t: t.select([cluster_id_col]).rename_columns([id_col]),
            batch_format="pyarrow", zero_copy_batch=True),
        id_col, anti=True,
    )
    return winners.union(untouched)


def cap_clusters(
    ds: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    *,
    id_col: str,
    k: int = 2,
    score_col: Optional[str] = None,
    cluster_col: str = "cluster_id",
    cluster_id_col: str = "id",
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Cluster-cap subsampling — the softened form of ``keep_best``
    (its ``k = 1`` special case): inside every duplicate cluster keep
    at most ``k`` rows (highest ``score_col`` first, ties → smallest
    id; pure smallest-id order when ``score_col`` is None), plus every
    row that never entered the pair graph. The standard "cap each
    near-dup family at k copies" move when exact removal is too
    aggressive (duplicates carry some signal; a cap bounds their
    training weight). Returns a one-column Dataset of kept ids.

    Shape: cluster labels join their scores through one bucketed
    exchange, then ``group_top_k``'s k-cap combiner (a hot cluster
    moves at most ``k`` rows per block, never its contents); the
    unclustered complement is the size-adaptive anti ``semi_join`` —
    nothing corpus-sized is materialized anywhere.
    """
    from .grouped import resolve_num_buckets as _rnb
    num_buckets = _rnb(ds, num_buckets)
    import pandas as _pd

    from .asof import semi_join
    from .grouped import group_top_k
    from .join import equi_join

    if k < 1:
        raise ValueError("cap_clusters: k must be >= 1")
    lab = clusters.map_batches(
        lambda t: t.rename_columns([id_col, cluster_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    rank_col = "__cap_rank__"
    if score_col is None:
        # smallest-id-first under a desc-ordered top-k: rank on -id
        scored = lab.map_batches(
            lambda df: df.assign(**{rank_col: -df[id_col].to_numpy()}),
            batch_format="pandas",
        )
    else:
        joined = equi_join(
            lab, ds.select_columns([id_col, score_col]), on=id_col,
            num_buckets=num_buckets,
        )
        scored = joined.map_batches(
            lambda df: df.assign(**{rank_col: df[score_col].to_numpy()}),
            batch_format="pandas",
        )
    kept = group_top_k(scored, cluster_col, rank_col, k=k,
                       tiebreak=[id_col], num_buckets=num_buckets)
    kept_ids = kept.map_batches(
        lambda t: t.select([id_col]), batch_format="pyarrow", zero_copy_batch=True)
    untouched = semi_join(
        ds.select_columns([id_col]),
        clusters.map_batches(
            lambda t: t.select([cluster_id_col]).rename_columns([id_col]),
            batch_format="pyarrow", zero_copy_batch=True),
        id_col, anti=True,
    )
    return kept_ids.union(untouched)


def contamination_rate(
    corpus: ray.data.Dataset,
    reference: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    portable: bool = False,
    num_buckets: Optional[int] = None,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Graded decontamination: per corpus document, the FRACTION of its
    distinct ``shingle_k``-token shingles that appear anywhere in the
    reference corpus — the overlap-rate form of ``contaminated_ids``
    (GPT-3-style n-gram overlap scoring: a doc quoting one benchmark
    line scores low, a verbatim copy scores ~1; the binary probe can't
    tell them apart). Same plumbing: both sides reduce to distinct
    shingle hashes per block, ONE hash exchange co-locates them, each
    bucket emits per-doc (hits, total) partials, a combiner sum merges
    across buckets and the rate is an exact integer ratio quantized to
    ``round_to``. Docs with no shingles emit nothing. Text never moves.
    """
    from .grouped import resolve_num_buckets as _rnb
    # explosion factor (ADVICE r4): the exchange carries one (hash64,
    # id) row per token position (~16 B) vs ~6 B/token of input text —
    # exchanged bytes ≈ 3x input; 4 prices the 1 GiB/bucket target on
    # the exchanged volume
    num_buckets = _rnb(corpus, num_buckets, factor=4.0)
    token_re = re.compile(ASCII_WORD_RE)
    from ..core import _schema

    id_type = _schema(corpus).field(id_col).type
    SIDE_COL = "__side__"
    row_schema = pa.schema([("__h__", pa.uint64()), (id_col, id_type), (SIDE_COL, pa.int8())])

    def corpus_hashes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_h, out_id = [], []
        for i, txt in enumerate(texts):
            hs = shingle_hashes(txt or "", shingle_k, token_re, portable)
            if len(hs):
                hs = np.unique(hs)
                out_h.append(hs)
                out_id.append(np.full(len(hs), ids[i], dtype=ids.dtype))
        h = np.concatenate(out_h) if out_h else np.array([], dtype=np.uint64)
        i = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
        n = len(h)
        return pa.table({
            "__h__": pa.array(h, type=pa.uint64()),
            id_col: pa.array(i).cast(id_type),
            SIDE_COL: pa.array(np.zeros(n, dtype=np.int8)),
        }, schema=row_schema)

    def ref_hashes(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [shingle_hashes(t or "", shingle_k, token_re, portable) for t in texts]
        hs = [h for h in hs if len(h)]
        flat = np.unique(np.concatenate(hs)) if hs else np.array([], dtype=np.uint64)
        return pa.table({
            "__h__": pa.array(flat, type=pa.uint64()),
            id_col: pa.nulls(len(flat), type=id_type),
            SIDE_COL: pa.array(np.ones(len(flat), dtype=np.int8)),
        }, schema=row_schema)

    ch = corpus.select_columns([id_col, text_col]).map_batches(
        corpus_hashes, batch_format="pyarrow")
    rh = reference.select_columns([text_col]).map_batches(ref_hashes, batch_format="pyarrow")

    from .grouped import BUCKET_COL, hash_groupby_aggregate, hash_key_column

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash_key_column(t.column("__h__"), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    bucketed = ch.union(rh).map_batches(add_bucket, batch_format="pyarrow",
                                        zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        # ArrowDtype: a plain to_pandas would give the id column float64
        # in buckets that hold null-id REFERENCE rows and int64 in
        # buckets that don't — the same doc would then hash apart in the
        # follow-up combiner exchange and its (hits, total) partials
        # would never merge (same trap _set_op documents).
        df = t.drop_columns([BUCKET_COL]).to_pandas(types_mapper=pd.ArrowDtype)
        ref_set = df.loc[df[SIDE_COL] == 1, "__h__"].to_numpy(dtype=np.uint64)
        corp = df[df[SIDE_COL] == 0]
        hit = np.isin(corp["__h__"].to_numpy(dtype=np.uint64),
                      np.unique(ref_set)).astype(np.int64)
        out = pd.DataFrame({id_col: corp[id_col].to_numpy(), "__hit__": hit,
                            "__one__": np.ones(len(corp), dtype=np.int64)})
        g = out.groupby(id_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
    sums = hash_groupby_aggregate(
        parts, [id_col],
        {"hits": ("__hit__", "sum"), "n_shingles": ("__one__", "sum")},
        num_buckets=32,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        hits = df["hits"].to_numpy(dtype=np.float64)
        tot = df["n_shingles"].to_numpy(dtype=np.float64)
        r = hits * 1.0 / tot
        scale = 10.0 ** round_to
        r = np.sign(r) * np.floor(np.abs(r) * scale + 0.5) / scale
        return pd.DataFrame({id_col: df[id_col],
                             "n_shingles": df["n_shingles"].astype(np.int64),
                             "contamination_rate": r})

    return sums.map_batches(finish, batch_format="pandas")


def source_overlap(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    portable: bool = True,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Corpus-overlap matrix: pairwise shingle-set Jaccard between the
    ``group_col`` partitions of the corpus (which crawls / dumps /
    domains duplicate each other — the mix-deduplication report run
    before blending training sources). Emits one row per UNORDERED pair
    with at least one shared shingle: ``(source_a, source_b, n_a, n_b,
    n_common, jaccard)`` where ``n_*`` are DISTINCT shingle counts and
    ``jaccard = n_common / (n_a + n_b - n_common)`` — an exact ratio of
    int64 counts, 6dp-quantized only for the cross-engine ln-free
    division convention.

    Shape: each block reduces to its distinct ``(hash, group)`` pairs
    (text never moves), ONE hash exchange on the shingle hash
    co-locates every occurrence of a shingle, and inside each bucket a
    vectorized self-merge emits per-pair intersection partials (a
    shingle shared by g groups costs g² partial rows, g ≤ #sources)
    plus per-group distinct totals — each hash lives in exactly one
    bucket, so bucket-local distinct counts sum globally. A final
    sources²-sized combiner aggregate finishes. Exchange bytes are
    bounded by distinct (shingle, source) pairs, never corpus bytes.
    """
    from .grouped import resolve_num_buckets as _rnb
    # explosion factor: one (hash64, source) row per distinct shingle
    # occurrence vs ~6 B/token of input text (see contaminated_ids)
    num_buckets = _rnb(ds, num_buckets, factor=4.0)
    token_re = re.compile(ASCII_WORD_RE)
    _TOT = "\x00__total__"

    def block_pairs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        groups = batch.column(group_col).to_pylist()
        out_h, out_g = [], []
        for txt, g in zip(texts, groups):
            if g is None:
                continue
            hs = shingle_hashes(txt or "", shingle_k, token_re, portable)
            if len(hs):
                hs = np.unique(hs)
                out_h.append(hs)
                out_g.append(np.full(len(hs), g, dtype=object))
        h = np.concatenate(out_h) if out_h else np.array([], dtype=np.uint64)
        g = np.concatenate(out_g) if out_g else np.array([], dtype=object)
        df = pd.DataFrame({"__h__": h, group_col: g}).drop_duplicates()
        return pa.table({
            "__h__": pa.array(df["__h__"].to_numpy(), type=pa.uint64()),
            group_col: pa.array(df[group_col], type=pa.string()),
        })

    from .grouped import BUCKET_COL, hash_groupby_aggregate, hash_key_column

    pairs = ds.select_columns([id_col, group_col, text_col]).map_batches(
        block_pairs, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash_key_column(t.column("__h__"), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    bucketed = pairs.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "__h__": t.column("__h__").to_numpy(zero_copy_only=False),
            group_col: t.column(group_col).to_pandas(),
        }).drop_duplicates()  # block-level distinct → bucket-level distinct
        tot = df.groupby(group_col, sort=False).size().reset_index(name="__n__")
        m = df.merge(df, on="__h__")
        m = m[m[f"{group_col}_x"] < m[f"{group_col}_y"]]
        inter = m.groupby([f"{group_col}_x", f"{group_col}_y"], sort=False) \
            .size().reset_index(name="__n__")
        out = pd.concat([
            pd.DataFrame({"ga": inter[f"{group_col}_x"], "gb": inter[f"{group_col}_y"],
                          "__n__": inter["__n__"].astype(np.int64)}),
            pd.DataFrame({"ga": tot[group_col], "gb": _TOT,
                          "__n__": tot["__n__"].astype(np.int64)}),
        ], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")
    merged = hash_groupby_aggregate(
        partials, ["ga", "gb"], {"n": ("__n__", "sum")}, num_buckets=8,
    ).to_pandas()  # sources²-sized RESULT — driver finish by design

    totals = merged[merged["gb"] == _TOT].set_index("ga")["n"]
    inter = merged[merged["gb"] != _TOT]
    na = totals.reindex(inter["ga"]).to_numpy(np.int64)
    nb = totals.reindex(inter["gb"]).to_numpy(np.int64)
    nc = inter["n"].to_numpy(np.int64)
    jac = nc.astype(np.float64) / (na + nb - nc).astype(np.float64)
    out = pd.DataFrame({
        "source_a": inter["ga"].to_numpy(),
        "source_b": inter["gb"].to_numpy(),
        "n_a": na, "n_b": nb, "n_common": nc,
        "jaccard": np.floor(jac * 1e6 + 0.5) / 1e6,
    }).sort_values(["source_a", "source_b"]).reset_index(drop=True)
    return ray.data.from_pandas(out)


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, vectorized one DP row at a time —
    byte-identical to DuckDB ``levenshtein`` on the ASCII-only strings
    this module feeds it (callers normalize away non-ASCII first, so
    bytes == codepoints and the two definitions coincide)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode(), dtype=np.uint8)
    prev = np.arange(len(bv) + 1, dtype=np.int64)
    for i, ca in enumerate(a.encode(), start=1):
        sub = prev[:-1] + (bv != ca)
        cur = np.empty_like(prev)
        cur[0] = i
        # insertion chains propagate left-to-right: one accumulate pass
        cur[1:] = np.minimum(prev[1:] + 1, sub)
        np.minimum.accumulate(cur + np.arange(len(cur), 0, -1), out=cur)
        cur -= np.arange(len(cur), 0, -1)
        prev = cur
    return int(prev[-1])


_EDIT_NORM_DROP = re.compile(r"[^a-z0-9 \t\n\r\f\v]")
_EDIT_NORM_WS = re.compile(r"[ \t\n\r\f\v]+")


def edit_distance_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    prefix_len: int = 12,
    max_len: int = 400,
    max_block: int = 256,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Typo-level near-duplicate pairs by EXACT edit distance ≤
    ``max_dist`` under deterministic prefix blocking — the
    character-level member of the dedup family (exact/MinHash/SimHash/
    Jaccard/embedding cover token and vector surfaces; OCR noise,
    mojibake and single-keystroke variants live BELOW the shingle
    granularity and need character edits).

    Normalization (identical in the SQL replay): lower → drop
    non-``[a-z0-9 \\s]`` (kills the byte-vs-codepoint ambiguity —
    DuckDB's levenshtein is byte-based, ours is too once ASCII-only) →
    collapse whitespace runs to one space → trim. Candidates = docs
    sharing the first ``prefix_len`` normalized chars, the classic
    blocking key (an edit inside the prefix escapes the block —
    documented recall bound, standard for blocking-based ER); docs
    normalize-ing to empty or longer than ``max_len`` are excluded
    (cost bound: DP is O(len²)); blocks larger than ``max_block`` are
    skipped wholesale (deterministic — boilerplate floods would go
    quadratic; both sides apply the same rule). Inside a block, a cheap
    O(len) char-histogram L1 lower bound (dist ≥ L1/2) gates the
    O(len²) DP, so same-length template floods cost a bincount, not a
    DP, per pair.

    Scale shape: ONE block-key exchange in which the normalized text
    rides once (same contract as line-level dedup); in-block pairs are
    the small side by construction. Output ``(id_a, id_b, dist)`` with
    ``id_a < id_b``."""
    from .grouped import resolve_num_buckets as _rnb
    # explosion factor: normalized text rides once plus per-row block
    # keys — exchanged ≈ 2x input bytes
    num_buckets = _rnb(ds, num_buckets, factor=2.0)
    from .grouped import grouped_ordered_map

    def normalize(b: pd.DataFrame) -> pd.DataFrame:
        t = (b[text_col].fillna("").astype(str).str.lower()
             .str.replace(_EDIT_NORM_DROP, "", regex=True)
             .str.replace(_EDIT_NORM_WS, " ", regex=True)
             .str.strip())
        ln = t.str.len()
        keep = (ln >= 1) & (ln <= max_len)
        return pd.DataFrame({id_col: b[id_col].to_numpy()[keep],
                             "t": t.to_numpy()[keep],
                             "k": t.str.slice(0, prefix_len).to_numpy()[keep]})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        keys = g["k"].to_numpy(dtype=object)
        from .grouped import entity_segments
        segs = entity_segments(keys)
        ids = g[id_col].to_numpy()
        texts = g["t"].to_numpy(dtype=object)
        for s, e in zip(segs[:-1], segs[1:]):
            if e - s < 2 or e - s > max_block:
                continue
            # O(len) histogram lower bound before the O(len²) DP: one
            # edit op changes the char-histogram L1 by ≤2, so
            # dist ≥ L1/2 — kills same-length template floods that the
            # |len_a−len_b| prefilter can't (worst case without it:
            # ~max_block²/2 DPs of ~max_len² cells in ONE bucket task).
            # The normalized alphabet is [a-z0-9 ] → 256-wide bincount
            # per doc, computed once per block, pairwise L1 in numpy.
            hist = np.zeros((e - s, 256), dtype=np.int32)
            for i in range(s, e):
                hist[i - s] = np.bincount(
                    np.frombuffer(texts[i].encode(), dtype=np.uint8),
                    minlength=256)
            for i in range(s, e):
                l1 = np.abs(hist[i - s + 1:] - hist[i - s]).sum(axis=1)
                for jo in np.nonzero(l1 <= 2 * max_dist)[0]:
                    j = i + 1 + int(jo)
                    if abs(len(texts[i]) - len(texts[j])) > max_dist:
                        continue
                    d = _levenshtein(texts[i], texts[j])
                    if d <= max_dist:
                        out_a.append(ids[i]); out_b.append(ids[j]); out_d.append(d)
        return pd.DataFrame({"id_a": np.array(out_a, dtype=np.int64),
                             "id_b": np.array(out_b, dtype=np.int64),
                             "dist": np.array(out_d, dtype=np.int64)})

    narrowed = ds.select_columns([id_col, text_col]).map_batches(normalize, batch_format="pandas")
    return grouped_ordered_map(narrowed, "k", [id_col], per_bucket, num_buckets=num_buckets)
