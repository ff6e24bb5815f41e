"""Deduplication family for web-scale corpora: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Common canonical-representative semantics: within each duplicate
cluster, the row with the SMALLEST ``id_col`` survives (deterministic,
order-free). All variants follow the same scale shape:

  vectorized signature ``map_batches``  →  explode to (bucket, id)
  →  ``groupby(bucket)`` (the only shuffle)  →  per-bucket min-id
  →  tiny survivor set  →  broadcast semi-join filter.

A document is dropped iff some bucket links it to a smaller id — the
"bucket-min" approximation of connected components (transitive
closure within one hop; iterate ``rounds`` times for full closure).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .asof import semi_join
from .grouped import clamp_concurrency

_MERSENNE = (1 << 61) - 1


def hash_strings64(strings: list[str]) -> np.ndarray:
    """Deterministic vectorized 64-bit string hashing
    (``pd.util.hash_array`` uses a fixed key — stable across processes,
    and C-speed instead of a per-byte Python loop)."""
    if not strings:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(strings, dtype=object))


def _token_hashes(text: str, token_re: re.Pattern) -> np.ndarray:
    return hash_strings64(token_re.findall(text.lower()))


# fixed odd constants for positional shingle mixing (deterministic)
_SHINGLE_C = (np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)


def shingle_hashes(text: str, k: int, token_re: re.Pattern) -> np.ndarray:
    """k-token shingles -> uint64 hashes (vector per doc).

    Fully vectorized: tokens hash once (C-speed), then each shingle is
    a position-weighted wrap-around combination of its k token hashes
    via a sliding window — no per-shingle string joins (which were the
    hot loop: ~3M Python joins for 5k docs)."""
    toks = token_re.findall(text.lower())
    th = hash_strings64(toks)
    n = len(th)
    if n == 0:
        return th
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

def _canonical_via_buckets(
    exploded: ray.data.Dataset,
    *,
    id_col: str,
    group_cols: Sequence[str],
    verify_fn=None,
    num_buckets: int = 64,
):
    """(id, canonical) links from an exploded (group_key..., id) table.

    Ray's ``groupby(fine_key).map_groups`` costs one Python call per
    group — catastrophic for LSH tables with ~1 group per row. Instead
    the fine groups are HASH-COARSENED into ``num_buckets`` buckets
    (every fine group lands wholly in one bucket), one shuffle
    co-locates them, and inside each bucket a single vectorized pandas
    ``groupby(...).transform("min")`` (or ``verify_fn`` per fine group
    for verified variants) computes the per-group min id.

    Returns the survivor id Dataset (ids that are their own canonical
    min across every group they belong to).
    """
    group_cols = list(group_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        df_keys = t.select(group_cols).to_pandas()
        h = pd.util.hash_pandas_object(df_keys, index=False).to_numpy()
        return t.append_column("__gbucket__", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    bucketed = exploded.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def links(g: pd.DataFrame) -> pd.DataFrame:
        if verify_fn is None:
            canon = g.groupby(group_cols, sort=False)[id_col].transform("min")
            out = pd.DataFrame({id_col: g[id_col], "canonical": canon})
        else:
            parts = [verify_fn(sub) for _, sub in g.groupby(group_cols, sort=False)]
            out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame({id_col: [], "canonical": []})
        # pre-reduce within the bucket: one row per id
        return out.groupby(id_col, as_index=False)["canonical"].min()

    linked = bucketed.groupby("__gbucket__").map_groups(
        lambda g: links(g.drop(columns=["__gbucket__"])), batch_format="pandas"
    )
    from ray.data.aggregate import Min

    canon = linked.groupby(id_col).aggregate(Min("canonical", alias_name="canonical"))
    return canon.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column(id_col), t.column("canonical"))).select([id_col]),
        batch_format="pyarrow",
    )


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
    digest group, then semi-join the survivors back. Survivor-id sets
    are tiny relative to the payload, so the full rows never shuffle
    twice."""

    def add_digest(batch: pa.Table) -> pa.Table:
        df = batch.select(list(content_cols)).to_pandas()
        # two independent 64-bit hashes -> effective 128-bit digest;
        # birthday-bound collision odds stay negligible (~1e-20 at 4B
        # rows), where a single 64-bit digest would silently merge
        # distinct rows at web scale
        h1 = pd.util.hash_pandas_object(df, index=False).astype("int64")
        h2 = pd.util.hash_pandas_object(df, index=False, hash_key="1b893793ce274cce").astype("int64")
        batch = batch.append_column("__digest1__", pa.array(h1.to_numpy()))
        return batch.append_column("__digest2__", pa.array(h2.to_numpy()))

    digested = ds.map_batches(add_digest, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Min

    survivors = (
        digested.select_columns(["__digest1__", "__digest2__", id_col])
        .groupby(["__digest1__", "__digest2__"])
        .aggregate(Min(id_col, alias_name=id_col))
    )
    keep_ids = survivors.select_columns([id_col])
    return semi_join(ds, keep_ids, id_col, assume_unique=True)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor: permutation parameters generated ONCE per actor from a
    fixed seed; per batch computes num_perm minhashes per doc and
    explodes them into (band_id, band_hash, id) rows. With
    ``carry_text=True`` each exploded row also carries the doc text
    (bands× duplication) so downstream buckets can verify exactly
    without any driver-side lookup table."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int, shingle_k: int, seed: int,
                 carry_text: bool = False):
        self.carry_text = carry_text
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.rows_per_band = num_perm // bands
        self.num_perm, self.bands = num_perm, bands
        self.text_col, self.id_col, self.k = text_col, id_col, shingle_k
        self.token_re = re.compile(r"\w+")

    def signature(self, text: str) -> Optional[np.ndarray]:
        sh = shingle_hashes(text, self.k, self.token_re)
        if len(sh) == 0:
            return None
        # (a*x + b) mod p, min over shingles, vectorized (num_perm × n)
        prod = (self.a[:, None] * (sh[None, :] % _MERSENNE)) % _MERSENNE
        return ((prod + self.b[:, None]) % _MERSENNE).min(axis=1)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """All band hashes at once: reshape (bands, rows_per_band),
        multiply-mod by the first rows_per_band permutation params, and
        XOR-reduce along the band axis — one vectorized op, not a
        Python loop per band."""
        chunks = sig.reshape(self.bands, self.rows_per_band)
        mixed = (chunks * self.a[None, : self.rows_per_band]) % _MERSENNE
        return np.bitwise_xor.reduce(mixed, axis=1) % _MERSENNE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes, texts = [], [], [], []
        band_range = np.arange(self.bands, dtype=np.int32)
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.signature(text)
            if sig is None:
                # no shingles (empty/punctuation-only text): not a
                # near-dup of anything — emit a singleton bucket keyed
                # by the doc's own id so the doc SURVIVES dedup instead
                # of silently disappearing from the output
                ids.append(doc_id)
                band_ids.append(np.array([-1], dtype=np.int32))
                band_hashes.append(
                    pd.util.hash_pandas_object(pd.Series([doc_id]), index=False).to_numpy().astype(np.int64)
                )
                if self.carry_text:
                    texts.append(text)
                continue
            bh = self.band_hashes(sig)
            ids.extend([doc_id] * self.bands)
            band_ids.append(band_range)
            band_hashes.append(bh.astype(np.int64))
            if self.carry_text:
                texts.extend([text] * self.bands)
        out = {
            self.id_col: ids,
            "band_id": np.concatenate(band_ids) if band_ids else np.array([], dtype=np.int32),
            "band_hash": np.concatenate(band_hashes) if band_hashes else np.array([], dtype=np.int64),
        }
        if self.carry_text:
            out[self.text_col] = texts
        return pd.DataFrame(out)


def minhash_survivors(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 7,
    concurrency=8,
) -> ray.data.Dataset:
    """(id, canonical_id) pairs: canonical = min id over all shared LSH
    buckets (one hop)."""
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        batch_format="pandas",
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed),
    )

    return _canonical_via_buckets(exploded, id_col=id_col, group_cols=["band_id", "band_hash"])


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
) -> ray.data.Dataset:
    """Keep rows whose id is its own cluster canonical (min over every
    bucket it shares)."""
    keep = minhash_survivors(
        ds, text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, seed=seed, concurrency=clamp_concurrency(concurrency),
    )
    return semi_join(ds, keep, id_col, assume_unique=True)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash per doc + 4×16-bit chunk bucketing (docs within
    Hamming distance 3 share at least one exact chunk)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col
        self.token_re = re.compile(r"\w+")

    def simhash(self, text: str, hashes: Optional[np.ndarray] = None) -> int:
        if hashes is None:
            hashes = _token_hashes(text, self.token_re)
        if len(hashes) == 0:
            return 0
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        score = (2 * bits - 1).sum(axis=0)
        out = 0
        for i in range(64):
            if score[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, chunk_ids, chunk_vals, sims = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            hashes = _token_hashes(text, self.token_re)
            if len(hashes) == 0:
                # tokenless doc: singleton bucket (survives; never a
                # near-dup candidate) instead of colliding at simhash 0
                ids.append(doc_id)
                chunk_ids.append(-1)
                chunk_vals.append(
                    int(pd.util.hash_pandas_object(pd.Series([doc_id]), index=False).iloc[0] & 0x7FFFFFFF)
                )
                sims.append(0)
                continue
            sh = self.simhash(text, hashes)
            for c in range(4):
                ids.append(doc_id)
                chunk_ids.append(c)
                chunk_vals.append((sh >> (16 * c)) & 0xFFFF)
                sims.append(sh - (1 << 63) if sh >= (1 << 63) else sh)
        return pd.DataFrame({self.id_col: ids, "chunk_id": chunk_ids, "chunk_val": chunk_vals, "simhash": sims})


def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    hamming_threshold: int = 3,
    concurrency=8,
) -> ray.data.Dataset:
    """Candidates share a 16-bit chunk; verified by Hamming distance on
    the full 64-bit simhash inside the bucket; min-id canonical."""
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher, batch_format="pandas", concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(text_col, id_col),
    )

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        sims = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ids = g[id_col].to_numpy()
        canon = ids.copy()
        for i in range(1, len(g)):
            x = sims[:i] ^ sims[i]
            ham = np.array([bin(int(v)).count("1") for v in x])
            close = np.flatnonzero(ham <= hamming_threshold)
            if len(close):
                canon[i] = min(canon[i], canon[close[0]])
        return pd.DataFrame({id_col: ids, "canonical": canon})

    keep = _canonical_via_buckets(
        exploded, id_col=id_col, group_cols=["chunk_id", "chunk_val"], verify_fn=bucket_verify
    )
    return semi_join(ds, keep, id_col, assume_unique=True)


# ---------------------------------------------------------------------------
# n-gram Jaccard verified dedup
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
) -> ray.data.Dataset:
    """MinHash-LSH candidate generation + EXACT n-gram Jaccard
    verification inside each bucket (pairs below ``threshold`` are not
    linked). The scale shape matches ``minhash_dedup``; the verify adds
    one shingle recomputation per bucket member."""
    token_re_src = r"\w+"

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher, batch_format="pandas", concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(text_col, id_col, num_perm, bands, shingle_k, seed, True),
    )

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        token_re = re.compile(token_re_src)
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        shingles = [set(shingle_hashes(t, shingle_k, token_re).tolist()) for t in g[text_col].fillna("")]
        canon = ids.copy()
        for i in range(1, len(ids)):
            for j in range(i):
                a, b = shingles[i], shingles[j]
                if not a or not b:
                    continue
                jac = len(a & b) / len(a | b)
                if jac >= threshold:
                    canon[i] = min(canon[i], canon[j])
                    break
        return pd.DataFrame({id_col: ids, "canonical": canon})

    keep = _canonical_via_buckets(
        exploded, id_col=id_col, group_cols=["band_id", "band_hash"], verify_fn=bucket_verify
    )
    return semi_join(ds, keep, id_col, assume_unique=True)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Random-hyperplane LSH for unit vectors: ``nbits`` sign bits from
    a fixed-seed Gaussian projection -> bucket id."""

    def __init__(self, emb_col: str, id_col: str, dim: int, nbits: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.emb_col, self.id_col = emb_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[self.emb_col].to_numpy())
        signs = (mat @ self.planes) > 0
        bucket = signs @ (1 << np.arange(signs.shape[1], dtype=np.int64))
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(), "bucket": bucket})
        out["emb"] = list(mat)
        return out


def embedding_dedup(
    ds: ray.data.Dataset,
    *,
    emb_col: str,
    id_col: str,
    threshold: float = 0.98,
    nbits: int = 8,
    seed: int = 11,
    concurrency=8,
) -> ray.data.Dataset:
    """Cosine near-dup: hyperplane buckets (vectors with cosine ~1 agree
    on all sign bits with high probability), exact pairwise cosine
    verification per bucket, min-id canonical."""
    dim = len(ds.take(1)[0][emb_col])
    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneBucketer, batch_format="pandas", concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(emb_col, id_col, dim, nbits, seed),
    )

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.stack(g["emb"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        canon = ids.copy()
        for i in range(1, len(ids)):
            close = np.flatnonzero(cos[i, :i] >= threshold)
            if len(close):
                canon[i] = min(canon[i], canon[close[0]])
        return pd.DataFrame({id_col: ids, "canonical": canon})

    keep = _canonical_via_buckets(bucketed, id_col=id_col, group_cols=["bucket"], verify_fn=bucket_verify)
    return semi_join(ds, keep, id_col, assume_unique=True)
