"""Distributed dense linear algebra over embedding columns.

``embedding_covariance`` computes the d×d population covariance of a
``list<float>`` column as a pure combiner reduction: each block is
reduced to ``X^T X`` (d×d), the column sums (d) and a row count —
O(d²) per block regardless of rows — and the tiny partials merge
through one term-hash exchange. At 100 TB the exchanged bytes are
``blocks × d² × 8`` (a few GB for d=64 and a million blocks), never a
function of row count. The eigendecomposition of the result (for PCA
whitening / projection) is a driver-side ``np.linalg.eigh`` on a d×d
matrix — intentionally not distributed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .grouped import hash_groupby_aggregate


def _stack(batch: pa.Table, col: str) -> np.ndarray:
    """(rows, d) float64 from a list<float> column or Ray's tensor
    extension type (``from_pandas`` of numpy rows produces the latter)."""
    arr = batch.column(col).combine_chunks()
    try:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
    except AttributeError:
        return np.asarray(arr.to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)
    d = len(flat) // max(1, batch.num_rows)
    return flat.reshape(batch.num_rows, d).astype(np.float64)


def embedding_covariance(
    ds: ray.data.Dataset, col: str = "embedding", *, num_buckets: int = 8
) -> pd.DataFrame:
    """Upper-triangle population covariance as a small driver frame
    ``(i, j, cov)`` with ``i <= j`` (0-based dims):
    ``cov = E[x_i x_j] - E[x_i] E[x_j]``.

    Per-block partial rows: ``(i, j, sxy)`` for the upper triangle,
    ``(i, -1, sx_i)`` for the sums, ``(-1, -1, n)`` for the count —
    merged by ``hash_groupby_aggregate`` so no block list ever reaches
    the driver, only the final O(d²) aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _stack(batch, col)
        n, d = x.shape
        xtx = x.T @ x
        iu, ju = np.triu_indices(d)
        i = np.concatenate([iu, np.arange(d), [-1]]).astype(np.int32)
        j = np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int32)
        v = np.concatenate([xtx[iu, ju], x.sum(axis=0), [float(n)]])
        return pa.table({"i": pa.array(i), "j": pa.array(j), "v": pa.array(v)})

    merged = hash_groupby_aggregate(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        ["i", "j"],
        {"v": ("v", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    n = float(merged.loc[(merged["i"] == -1) & (merged["j"] == -1), "v"].iloc[0])
    sums = merged[(merged["j"] == -1) & (merged["i"] >= 0)].set_index("i")["v"]
    cross = merged[merged["j"] >= 0]
    mean = sums / n
    i = cross["i"].to_numpy()
    j = cross["j"].to_numpy()
    cov = cross["v"].to_numpy() / n - mean.loc[i].to_numpy() * mean.loc[j].to_numpy()
    out = pd.DataFrame({"i": i.astype(np.int64), "j": j.astype(np.int64), "cov": cov})
    return out.sort_values(["i", "j"]).reset_index(drop=True)


def pca_project(
    ds: ray.data.Dataset,
    col: str = "embedding",
    *,
    k: int,
    out_col: str = "pca",
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Project embeddings onto their top-``k`` principal components.
    Covariance via the combiner reduction above; eigenvectors on the
    driver (d×d); the projection matrix broadcasts into a vectorized
    per-batch matmul."""
    import ray as _ray

    tri = embedding_covariance(ds, col, num_buckets=num_buckets)
    d = int(tri["j"].max()) + 1
    cov = np.zeros((d, d))
    cov[tri["i"], tri["j"]] = tri["cov"]
    cov[tri["j"], tri["i"]] = tri["cov"]
    w, v = np.linalg.eigh(cov)
    proj = v[:, np.argsort(w)[::-1][:k]]  # d × k, descending eigenvalue
    ref = _ray.put(np.ascontiguousarray(proj))

    def apply(batch: pa.Table) -> pa.Table:
        p = _ray.get(ref)
        x = _stack(batch, col)
        y = x @ p
        return batch.append_column(out_col, pa.array(list(y)))

    return ds.map_batches(apply, batch_format="pyarrow")


def embedding_extrema(
    ds: ray.data.Dataset, col: str = "embedding", *, num_buckets: int = 8
) -> pd.DataFrame:
    """Per-dimension (min, max) as a small driver frame ``(dim, mn,
    mx)`` — one combiner pass (each block reduces to d rows), vectors
    never shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.float64()),
                             "mx": pa.array([], type=pa.float64())})
        x = _stack(batch, col)
        d = x.shape[1]
        return pa.table({"dim": pa.array(np.arange(d, dtype=np.int64)),
                         "mn": pa.array(x.min(axis=0)),
                         "mx": pa.array(x.max(axis=0))})

    merged = hash_groupby_aggregate(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        {"mn": ("mn", "min"), "mx": ("mx", "max")},
        num_buckets=num_buckets,
    ).to_pandas()
    return merged.sort_values("dim").reset_index(drop=True)


def quantize_embeddings(
    ds: ray.data.Dataset,
    col: str = "embedding",
    *,
    bits: int = 8,
    extrema: Optional[pd.DataFrame] = None,
    out_col: Optional[str] = None,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Scalar quantization of an embedding column to ``bits``-bit
    unsigned codes — the standard 4× (float32→uint8) index-compression
    step before ANN at corpus scale. Per dimension: ``q = floor((v −
    mn) / ((mx − mn) / (2^bits − 1)) + 0.5)``, constant dimensions
    (mx = mn) map to 0; dequantize as ``mn + q·scale``.

    Exactness: mn/mx are exact column values (float32 widens to float64
    losslessly), so scale, the affine transform and the floor are the
    SAME doubles in any engine — the code assignment is bit-exact and
    SQL-replayable, not approximately close. One combiner pass for the
    extrema (or pass ``extrema`` precomputed / from a training split),
    then a zero-shuffle vectorized map; vectors never ride an exchange.
    """
    if not (1 <= bits <= 16):
        raise ValueError("quantize_embeddings: bits must be in [1, 16]")
    levels = float(2**bits - 1)
    dst = out_col or f"{col}_q{bits}"
    ex = extrema if extrema is not None else embedding_extrema(ds, col, num_buckets=num_buckets)
    mn = ex["mn"].to_numpy(dtype=np.float64)
    sc = (ex["mx"].to_numpy(dtype=np.float64) - mn) / levels
    import ray as _ray

    ref = _ray.put((mn, sc))
    code_t = np.uint8 if bits <= 8 else np.uint16

    def apply(batch: pa.Table) -> pa.Table:
        m, s = _ray.get(ref)
        x = _stack(batch, col)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((x - m) / s + 0.5)
        q = np.where(s == 0.0, 0.0, q).astype(code_t)
        return batch.append_column(dst, pa.array(list(q)))

    return ds.map_batches(apply, batch_format="pyarrow")


def group_mean_embedding(
    ds: ray.data.Dataset,
    group_col: str,
    emb_col: str = "embedding",
    *,
    round_to: int | None = 6,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Mean-pooled embedding per group (class centroids — the prototype
    vectors for nearest-centroid classification, dedup seeding, or
    retrieval calibration), emitted in LONG form ``(group, dim,
    mean_val)`` so the result is order-free and SQL-auditable
    (``AVG(e) GROUP BY label, ordinality``).

    Pure combiner shape: each block reduces to one ``(group, Σvec, n)``
    partial — O(groups × d) per block regardless of rows — and the
    partials merge through one hash exchange; vectors themselves never
    shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        x = _stack(batch, emb_col)
        g = batch.column(group_col).to_pandas().to_numpy()
        df = pd.DataFrame(x)
        df["__g__"] = g
        agg = df.groupby("__g__", sort=False).agg(["sum", "count"])
        sums = agg.xs("sum", axis=1, level=1)
        cnt = agg.xs("count", axis=1, level=1).iloc[:, 0]
        out = pd.DataFrame({group_col: sums.index.to_numpy()})
        for j in range(x.shape[1]):
            out[f"__s{j}__"] = sums[j].to_numpy()
        out["__n__"] = cnt.to_numpy().astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    first = ds.limit(1).to_pandas()
    d = len(first[emb_col].iloc[0])
    parts = ds.select_columns([group_col, emb_col]).map_batches(partial, batch_format="pyarrow")
    aggs = {f"__s{j}__": (f"__s{j}__", "sum") for j in range(d)}
    aggs["__n__"] = ("__n__", "sum")
    merged = hash_groupby_aggregate(parts, [group_col], aggs, num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["__n__"].to_numpy(dtype=np.float64)
        rows = []
        for j in range(d):
            m = df[f"__s{j}__"].to_numpy(dtype=np.float64) / n
            if round_to is not None:
                m = np.sign(m) * np.floor(np.abs(m) * 10.0 ** round_to + 0.5) / 10.0 ** round_to
            rows.append(pd.DataFrame({
                group_col: df[group_col].to_numpy(),
                "dim": np.full(len(df), j, dtype=np.int64),
                "mean_val": m,
            }))
        return pd.concat(rows, ignore_index=True)

    return merged.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# distributed k-means (Lloyd's) — the corpus-clustering primitive behind
# semantic dedup sharding, IVF index training and data-mix curation
# ---------------------------------------------------------------------------

def kmeans_seed_centroids(
    ds: ray.data.Dataset, emb_col: str, k: int, *, id_col: str
) -> np.ndarray:
    """Deterministic seeds: the ``k`` vectors with the smallest
    ``id_col`` (cid = rank in that order). Fetched with the partial
    top-k combiner — O(blocks × k) driver rows, never a sort — so the
    choice is reproducible across any partitioning and SQL-replayable
    (``ORDER BY id LIMIT k``), unlike random inits that depend on block
    layout."""
    from .agg import top_k_rows

    rows = top_k_rows(ds.select_columns([id_col, emb_col]), id_col, k, ascending=True)
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds dataset rows ({len(rows)})")
    return np.asarray([np.asarray(v, dtype=np.float64) for v in rows[emb_col]])


def _nearest(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Row-wise argmin of squared L2 distance; ties → smallest cid.
    Distances use the direct ``Σ(x-c)²`` form (one n×d temp per
    centroid, k passes) rather than the ‖x‖²-2x·c+‖c‖² expansion: same
    flops vectorized, but the rounding matches a SQL ``list_distance``
    replay so near-ties can't flip the assignment between engines."""
    n = x.shape[0]
    best = np.zeros(n, dtype=np.int64)
    bestd = np.full(n, np.inf)
    for cid in range(cents.shape[0]):
        d2 = ((x - cents[cid]) ** 2).sum(axis=1)
        upd = d2 < bestd  # strict: earlier (smaller) cid wins ties
        best[upd] = cid
        bestd[upd] = d2[upd]
    return best


def kmeans_iterate(
    ds: ray.data.Dataset,
    emb_col: str,
    centroids: np.ndarray,
    *,
    iters: int = 1,
    num_buckets: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd iterations as pure combiner reductions: per iteration each
    block reduces to at most k partial rows ``(cid, Σvec, n)``, one
    k-sized hash exchange merges them, and the k×d result updates the
    broadcast centroids on the driver. Exchanged bytes per round are
    ``blocks × k × d × 8`` — never a function of row count — and the
    vectors themselves never shuffle. Empty clusters keep their
    previous centroid (count 0). Returns ``(centroids (k,d) float64,
    counts (k,) int64)`` after ``iters`` rounds."""
    import ray as _ray

    k, d = centroids.shape
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(int(iters)):
        cref = _ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            x = _stack(batch, emb_col)
            cid = _nearest(x, _ray.get(cref))
            df = pd.DataFrame(x)
            df["__c__"] = cid
            agg = df.groupby("__c__", sort=False).agg(["sum", "count"])
            sums = agg.xs("sum", axis=1, level=1)
            out = pd.DataFrame({"__c__": sums.index.to_numpy().astype(np.int64)})
            for j in range(x.shape[1]):
                out[f"__s{j}__"] = sums[j].to_numpy()
            out["__n__"] = agg.xs("count", axis=1, level=1).iloc[:, 0].to_numpy().astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        aggs = {f"__s{j}__": (f"__s{j}__", "sum") for j in range(d)}
        aggs["__n__"] = ("__n__", "sum")
        merged = hash_groupby_aggregate(
            ds.select_columns([emb_col]).map_batches(partial, batch_format="pyarrow"),
            ["__c__"], aggs, num_buckets=min(num_buckets, k),
        ).to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        new = centroids.copy()
        cids = merged["__c__"].to_numpy(dtype=np.int64)
        n = merged["__n__"].to_numpy(dtype=np.float64)
        counts[cids] = merged["__n__"].to_numpy(dtype=np.int64)
        sums = merged[[f"__s{j}__" for j in range(d)]].to_numpy(dtype=np.float64)
        new[cids] = sums / n[:, None]
        centroids = new
    return centroids, counts


def kmeans_assign(
    ds: ray.data.Dataset,
    emb_col: str,
    centroids: np.ndarray,
    *,
    out_col: str = "cluster",
) -> ray.data.Dataset:
    """Attach the nearest-centroid id (ties → smallest cid) — a
    zero-shuffle broadcast map over the fact stream."""
    import ray as _ray

    cref = _ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        x = _stack(batch, emb_col)
        cid = _nearest(x, _ray.get(cref))
        return batch.append_column(out_col, pa.array(cid, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def label_centroid_cosine(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    out_col: str = "cos_centroid",
    round_to: int | None = 6,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Intra-class coherence score: every vector gains the cosine
    similarity to ITS OWN label's mean embedding — the mislabel /
    outlier detector run over supervised training corpora (a row far
    from its class prototype is a labeling error or a hard case worth
    auditing). Rows with a null label drop (SQL inner-join-on-label
    semantics); a zero-norm side yields a null score.

    Shape: the labels×d centroid table comes from one combiner pass
    (each block reduces to per-label ``(Σvec, n)`` — O(labels × d)
    regardless of rows) merged through one label-hash exchange, then
    broadcasts into a zero-shuffle vectorized cosine map. Vectors never
    shuffle; the only exchanged bytes are ``blocks × labels × d × 8``.
    """
    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        x = _stack(batch, emb_col)
        g = batch.column(label_col).to_pandas()
        keep = g.notna().to_numpy()
        x, g = x[keep], g[keep]
        df = pd.DataFrame(x)
        df["__g__"] = g.to_numpy()
        agg = df.groupby("__g__", sort=False).agg(["sum", "count"])
        sums = agg.xs("sum", axis=1, level=1)
        out = pd.DataFrame({label_col: sums.index.to_numpy()})
        for j in range(x.shape[1]):
            out[f"__s{j}__"] = sums[j].to_numpy()
        out["__n__"] = agg.xs("count", axis=1, level=1).iloc[:, 0].to_numpy().astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    first = ds.limit(1).to_pandas()
    d = len(first[emb_col].iloc[0])
    parts = ds.select_columns([label_col, emb_col]).map_batches(partial, batch_format="pyarrow")
    aggs = {f"__s{j}__": (f"__s{j}__", "sum") for j in range(d)}
    aggs["__n__"] = ("__n__", "sum")
    cent = hash_groupby_aggregate(parts, [label_col], aggs, num_buckets=num_buckets).to_pandas()
    labels = cent[label_col].to_numpy()
    mats = cent[[f"__s{j}__" for j in range(d)]].to_numpy(np.float64) \
        / cent["__n__"].to_numpy(np.float64)[:, None]
    cref = _ray.put((pd.Index(labels), mats))

    def score(batch: pa.Table) -> pa.Table:
        idx, m = _ray.get(cref)
        x = _stack(batch, emb_col)
        g = batch.column(label_col).to_pandas()
        keep = g.notna().to_numpy()
        t = batch.filter(pa.array(keep))
        x = x[keep]
        li = idx.get_indexer(g[keep].to_numpy())
        c = m[li]
        dot = np.einsum("ij,ij->i", x, c)
        ne, nc = np.sqrt((x * x).sum(1)), np.sqrt((c * c).sum(1))
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot / (ne * nc)
        cos[(ne == 0) | (nc == 0)] = np.nan
        if round_to is not None:
            s = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                cos = np.sign(cos) * np.floor(np.abs(cos) * s + 0.5) / s
        cols = [n for n in t.column_names if n != emb_col]
        return t.select(cols).append_column(out_col, pa.array(cos, type=pa.float64()))

    return ds.select_columns([id_col, label_col, emb_col]).map_batches(
        score, batch_format="pyarrow")


def _half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """Round half away from zero (SQL ROUND), not numpy's half-even."""
    sc = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * sc + 0.5) / sc


def pca_power_loadings(
    ds: ray.data.Dataset,
    col: str = "embedding",
    *,
    iters: int = 10,
    cov_round: int = 6,
    step_round: int = 9,
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Top principal-component loadings via power iteration with
    per-step quantization — the SQL-replayable sibling of
    ``pca_project``: where eigh's output is engine-internal, this
    pins every float the iteration ever sees, so a SQL replay (same
    rounded covariance, same unrolled steps, same half-away rounds)
    reproduces the loadings EXACTLY rather than approximately.

    Protocol: (1) covariance from the combiner reduction, rounded
    half-away at ``cov_round`` — both sides iterate over the identical
    matrix, so the tiny order-of-addition float drift in the reduce can
    never compound; (2) ``iters`` fixed steps of ``v ← quantize(C v /
    ‖C v‖, step_round)`` from the uniform start ``1/√d`` — per-step
    quantization re-locks the two sides after each matmul (their
    intra-step drift is ~1e-16, far below the 5e-10 quantization
    boundary); (3) sign fix: flip so the largest-|loading| coordinate
    (ties → smallest index) is positive. A zero norm (zero covariance)
    yields all-null loadings, never a crash; empty input → empty frame.

    Distribution is the covariance pass (O(d²) per block, one partials
    exchange); the iteration itself is a driver closure on the d×d
    aggregate. Output: ``(i, loading)``, one row per dimension."""
    tri = embedding_covariance(ds, col, num_buckets=num_buckets)
    if not len(tri):
        return pd.DataFrame({"i": np.array([], dtype=np.int64),
                             "loading": np.array([], dtype=np.float64)})
    d = int(tri["j"].max()) + 1
    cov = np.zeros((d, d))
    cq = _half_away(tri["cov"].to_numpy(np.float64), cov_round)
    cov[tri["i"], tri["j"]] = cq
    cov[tri["j"], tri["i"]] = cq
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        u = cov @ v
        nrm = np.sqrt(np.sum(u * u))
        with np.errstate(divide="ignore", invalid="ignore"):
            v = _half_away(np.where(nrm == 0, np.nan, u / nrm), step_round)
    finite = np.isfinite(v)
    if finite.all() and len(v):
        # ties on |v| → smallest index, matching ORDER BY abs DESC, i
        m = int(np.argmax(np.abs(v)))
        if v[m] < 0:
            v = -v
    return pd.DataFrame({"i": np.arange(d, dtype=np.int64), "loading": v})
