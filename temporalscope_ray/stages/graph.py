"""Connected components over an edge list — duplicate-cluster
labeling for the near-dup dedup family.

The dedup operators emit candidate/verified PAIRS (``dedup.py``); what
a curation pipeline actually wants downstream is the CLUSTER: every
document labeled with its duplicate-group id (= the smallest doc id
reachable through pair links), so one canonical doc per cluster can be
kept, cluster sizes audited, and transitive chains (A~B, B~C but A≁C
directly) handled correctly — one-hop dropping breaks exactly there.

Algorithm: distributed min-label propagation. The vertex set is the
ids that appear in pairs — the DUPLICATE subset of the corpus, orders
of magnitude smaller than the corpus itself (singletons never enter
the graph; callers treat absent ids as their own cluster). Each
iteration: every vertex takes the min of its own label and its
neighbors' labels — one bucketed equi-join (labels onto edge sources)
plus one combiner-style groupby-min, then a cheap driver fixpoint
check on sum(label), which strictly decreases until convergence.
Iterations needed = graph diameter; near-dup clusters are shallow
(stars/short chains), so this converges in a handful of rounds —
``max_iters`` fails loud rather than looping forever on a pathological
chain (for which a large-star/small-star contraction would be the
upgrade path).

The per-iteration ``materialize()`` pins the CURRENT label table (the
small vertex set) — without it each round would lazily re-execute the
whole chain of previous rounds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .grouped import DEFAULT_NUM_BUCKETS, hash_groupby_aggregate


def _driver_cc(edges: "np.ndarray", ids: "np.ndarray") -> "np.ndarray":
    """Min-label pointer-jumping over an edge array on the driver —
    numpy-vectorized, O(log diameter) rounds at C speed. ``edges`` is
    an (m, 2) int64 array of INDICES into ``ids``; returns per-vertex
    min-reachable-id labels."""
    labels = ids.copy()
    ea, eb = edges[:, 0], edges[:, 1]
    for _ in range(64):
        nxt = labels.copy()
        np.minimum.at(nxt, ea, labels[eb])
        np.minimum.at(nxt, eb, labels[ea])
        # pointer jump: follow my label's own label
        pos = np.searchsorted(ids, nxt)
        nxt = np.minimum(nxt, labels[pos])
        if np.array_equal(nxt, labels):
            return labels
        labels = nxt
    raise RuntimeError("connected_components: driver fixpoint not reached in 64 rounds")


def connected_components(
    pairs: ray.data.Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "id",
    out_label: str = "cluster_id",
    max_iters: int = 30,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    driver_edge_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Label every id appearing in ``pairs`` with the min id of its
    connected component. Returns ``(out_id, out_label)``, one row per
    distinct vertex. Raises RuntimeError if ``max_iters`` rounds don't
    converge (diameter larger than max_iters).

    Size-adaptive like ``equi_join``/``semi_join``: an edge list under
    ``driver_edge_limit`` is solved ON THE DRIVER with vectorized
    pointer jumping (the dup-pair graph is usually orders of magnitude
    smaller than the corpus, and each distributed round costs a full
    exchange — measured ~30 s/round of pure overhead on a 1.8k-vertex
    graph at sf0.1); anything larger takes the distributed
    min-label-propagation rounds below, which never materialize the
    vertex set on the driver."""
    from .join import equi_join

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column(id_a)
        b = t.column(id_b)
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
        })

    edges = pairs.select_columns([id_a, id_b]).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if edges.count() == 0:
        # no duplicate pairs at all: an empty Ray dataset is schema-less
        # (e["src"] would KeyError) — return the typed empty vertex table
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame({
            out_id: np.array([], dtype=np.int64),
            out_label: np.array([], dtype=np.int64),
        }))

    if edges.count() <= driver_edge_limit:
        import pandas as pd

        e = edges.to_pandas()
        a = e["src"].to_numpy(dtype=np.int64)
        b = e["dst"].to_numpy(dtype=np.int64)
        ids = np.unique(np.concatenate([a, b]))
        idx = np.stack([np.searchsorted(ids, a), np.searchsorted(ids, b)], axis=1)
        labels = _driver_cc(idx, ids)
        out = pd.DataFrame({out_id: ids, out_label: labels}).drop_duplicates()
        return ray.data.from_pandas(out)

    # initial label = own id (min over self ∪ neighbors of the 0-hop set)
    labels = hash_groupby_aggregate(
        edges, ["src"], {"label": ("src", "min")}, num_buckets=num_buckets
    ).materialize()
    # the vertex set is the dup subset of the corpus — when it fits the
    # object store, each round's two label lookups run as broadcast
    # lookups against the pinned label blocks (plain TASKS over a
    # closure of object refs: no exchange, no actor-pool startup per
    # round) and only the final groupby-min shuffles
    bcast = labels.count() < 5_000_000

    def lookup_stage(src_ds, refs, in_col, out_col):
        """(in_col, ...) rows -> (src=out-col rows, label=label(in_col));
        rows whose in_col has no label emit nothing (inner semantics)."""

        def fn(t: pa.Table) -> pa.Table:
            import pandas as _pd

            tabs = [x.replace_schema_metadata(None) for x in ray.get(refs)]
            tabs = [x for x in tabs if x.num_columns > 0]
            lab = pa.concat_tables(tabs).to_pandas()
            m = _pd.Series(
                lab["label"].to_numpy(), index=lab["src"].to_numpy()
            )
            keys = t.column(in_col).to_numpy(zero_copy_only=False)
            looked = m.reindex(keys)
            ok = ~looked.isna().to_numpy()
            return pa.table({
                "src": pa.array(t.column(out_col).to_numpy(zero_copy_only=False)[ok]),
                "label": pa.array(looked.to_numpy()[ok].astype(np.int64)),
            })

        return src_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    prev_sum = None
    for _ in range(max_iters):
        if bcast:
            refs = list(labels.to_arrow_refs())
            # neighbor labels: edge (src, dst) contributes label(src) to dst
            contrib = lookup_stage(edges, refs, "src", "dst")
            # pointer jumping: contribute label(label(id)) to id — a
            # path's min floods 2^round hops per round (O(log diameter))
            as_key = labels.map_batches(
                lambda t: pa.table({"orig": t.column("src"), "key": t.column("label")}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            shortcut = lookup_stage(as_key, refs, "key", "orig")
        else:
            contrib = equi_join(
                edges, labels, "src", how="inner", broadcast=False, num_buckets=num_buckets
            ).map_batches(
                lambda t: pa.table({"src": t.column("dst"), "label": t.column("label")}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            as_key = labels.map_batches(
                lambda t: pa.table({"orig": t.column("src"), "src": t.column("label")}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            shortcut = equi_join(
                as_key, labels, "src", how="inner", broadcast=False, num_buckets=num_buckets
            ).map_batches(
                lambda t: pa.table({"src": t.column("orig"), "label": t.column("label")}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        # repartition bounds the label block count: union triples the
        # input blocks and map_groups preserves them, so without this
        # the per-round block count DOUBLES (3, 7, 15, ...) and round
        # cost grows exponentially — measured 30 s/round by round ~7
        # on a 1.8k-vertex graph.
        labels = hash_groupby_aggregate(
            labels.union(contrib).union(shortcut), ["src"], {"label": ("label", "min")},
            num_buckets=num_buckets,
        ).repartition(min(num_buckets, 8)).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels.map_batches(
                lambda t: t.rename_columns([out_id, out_label]),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} iterations "
        "(component diameter exceeds max_iters; raise it or contract the graph)"
    )


def pagerank_types(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    tiebreak=None,
    damping: float = 0.85,
    iters: int = 10,
    round_to: int = 6,
):
    """PageRank over the categorical transition graph: nodes are the
    distinct ``type_col`` values, edge weights are the per-entity
    consecutive transition probabilities ``count(src→dst) /
    out_total(src)`` (exact int ratios → identical doubles in any
    engine) — "which state does behavior concentrate in?", the
    stationary-importance companion to the raw Markov matrix
    (``agg.transition_counts``) and the entropy-rate scalar.

    Distribution: the fact table reduces ONCE through the existing
    transition exchange (entity-bucket lag + combiner counts) and once
    to the distinct-node set; the power iteration itself runs on the
    driver over the VOCABULARY-sized graph (|types| nodes, ≤|types|²
    edges — categorical state spaces are bounded; this is a driver
    closure over an aggregate, not a corpus loop). Dangling nodes
    (no out-edges) teleport their mass uniformly, the standard
    PageRank completion:

        r' = (1−d)/N + d·(Σ_src r_src·w(src,dst) + Σ_dangling r / N)

    Fixed ``iters`` rounds (not convergence-tested) so the SQL replay
    — the same recursion unrolled as chained CTEs — is step-identical.
    Returns a pandas DataFrame ``(node, pagerank)`` rounded half-away
    at ``round_to``; empty input → empty frame (SQL over zero nodes).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .agg import transition_counts

    edges = transition_counts(
        ds, id_col=id_col, time_col=time_col, type_col=type_col,
        tiebreak=tiebreak,
    ).to_pandas()  # vocabulary²-sized

    def distinct_types(t: pa.Table) -> pa.Table:
        col = t.column(type_col)
        return pa.table({"node": pc.unique(col.combine_chunks())})

    nodes_ds = hash_groupby_aggregate(
        ds.select_columns([type_col]).map_batches(distinct_types, batch_format="pyarrow"),
        ["node"], {"n": (None, "count")}, num_buckets=4,
    ).to_pandas()
    nodes = sorted(n for n in nodes_ds["node"].tolist() if n is not None)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.array([], dtype="string"),
                             "pagerank": np.array([], dtype=np.float64)})
    idx = {t: i for i, t in enumerate(nodes)}
    src = edges["prev_type"].map(idx).to_numpy(dtype=np.int64) if len(edges) else np.array([], dtype=np.int64)
    dst = edges["cur_type"].map(idx).to_numpy(dtype=np.int64) if len(edges) else np.array([], dtype=np.int64)
    cnt = edges["n"].to_numpy(dtype=np.float64) if len(edges) else np.array([], dtype=np.float64)
    out_tot = np.bincount(src, weights=cnt, minlength=n)
    w = cnt / out_tot[src] if len(cnt) else cnt  # exact int ratio
    has_out = out_tot > 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.bincount(dst, weights=r[src] * w, minlength=n) if len(cnt) else np.zeros(n)
        dang = float(r[~has_out].sum())
        r = (1.0 - damping) / n + damping * (s + dang / n)
    sc = 10.0 ** round_to
    pr = np.sign(r) * np.floor(np.abs(r) * sc + 0.5) / sc
    return pd.DataFrame({"node": pd.array(nodes, dtype="string"), "pagerank": pr})


def removal_effect_attribution(
    ds: "ray.data.Dataset",
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    conv_type: str,
    tiebreak=None,
    iters: int = 12,
    round_to: int = 6,
    num_buckets: int = 16,
):
    """Markov removal-effect attribution: per-channel importance as
    ``1 − P(conv | channel removed) / P(conv | full graph)`` over the
    first-conversion journey chain — the principled upgrade to
    last-touch (`window_features.last_touch_attribution`), standard in
    marketing/behavior analytics (Anderl et al. 2014 framework, public).

    Journey model: each entity's events in ``(time, tiebreak)`` order,
    TRUNCATED at its first ``conv_type`` event → absorbing state CONV;
    journeys that never convert append absorbing state NULL. START
    precedes every first event. Transition weights are exact count
    ratios ``n(prev→cur)/out(prev)``. Removing channel c redirects
    every edge INTO c to NULL and drops edges out of c (c unreachable),
    the standard removal-effect surgery; out-totals are preserved by
    construction. Absorption is approximated by a FIXED ``iters``
    power steps (not convergence-tested) so the SQL replay — the same
    recursion unrolled as chained CTEs per variant — is step-identical;
    both sides round half-away at ``round_to``.

    Distribution: the fact table reduces ONCE through an entity-bucket
    exchange (vectorized prefix-truncation + segment shifts — no
    per-entity Python), per-bucket (prev, cur) partial counts ride a
    second tiny exchange, and the per-variant power iteration runs on
    the driver over the VOCABULARY-sized chain (C+1 variants ×
    |types|² edges — bounded by the categorical state space, not the
    corpus). Output: one row per non-conversion channel,
    ``(channel, removal_effect)``; zero baseline conversions → null
    effects; empty input → empty frame.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .grouped import entity_segments, grouped_ordered_map

    order = [time_col, *(tiebreak or [])]
    START, CONV, NULLS = "__START__", "__CONV__", "__NULL__"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[type_col].notna()]
        if not len(g):
            return pd.DataFrame({"prev": pd.array([], dtype="string"),
                                 "cur": pd.array([], dtype="string"),
                                 "n": np.array([], dtype=np.int64)})
        ids = g[id_col].to_numpy()
        lab = g[type_col].to_numpy(dtype=object).copy()
        segs = entity_segments(ids)
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        isconv = lab == conv_type
        posc = np.where(isconv, pos, n)  # sentinel n = "no conv here"
        firstc = np.minimum.reduceat(posc, segs[:-1])  # per segment
        sizes = np.diff(segs)
        firstc_b = np.repeat(firstc, sizes)
        keep = pos <= firstc_b  # prefix through first conversion
        lab[pos == firstc_b] = CONV
        ids_k, lab_k = ids[keep], lab[keep]
        segs_k = entity_segments(ids_k)
        # transitions: prev = previous kept label within entity, START at heads
        prev = np.empty(len(lab_k), dtype=object)
        prev[1:] = lab_k[:-1]
        prev[segs_k[:-1]] = START
        # non-converting journeys additionally absorb into NULL
        last_idx = segs_k[1:] - 1
        no_conv = lab_k[last_idx] != CONV
        prev_all = np.concatenate([prev, lab_k[last_idx][no_conv]])
        cur_all = np.concatenate([lab_k, np.full(int(no_conv.sum()), NULLS, dtype=object)])
        out = pd.DataFrame({"prev": prev_all, "cur": cur_all})
        cnt = out.groupby(["prev", "cur"], sort=False).size().reset_index(name="n")
        cnt["prev"] = cnt["prev"].astype("string")
        cnt["cur"] = cnt["cur"].astype("string")
        cnt["n"] = cnt["n"].astype(np.int64)
        return cnt

    partial = grouped_ordered_map(
        ds.select_columns([id_col, *order, type_col]), id_col, order,
        per_bucket, num_buckets=num_buckets)
    edges = hash_groupby_aggregate(
        partial, ["prev", "cur"], {"n": ("n", "sum")}, num_buckets=4,
    ).to_pandas()  # vocabulary²-sized

    def distinct_types(t: pa.Table) -> pa.Table:
        col = pc.drop_null(t.column(type_col).combine_chunks())
        return pa.table({"node": pc.unique(col)})

    types_ds = hash_groupby_aggregate(
        ds.select_columns([type_col]).map_batches(distinct_types, batch_format="pyarrow"),
        ["node"], {"n": (None, "count")}, num_buckets=4).to_pandas()
    channels = sorted(t for t in types_ds["node"].tolist()
                      if t is not None and t != conv_type)
    if not channels or not len(edges):
        import pandas as pd
        return pd.DataFrame({"channel": pd.array([], dtype="string"),
                             "removal_effect": np.array([], dtype=np.float64)})

    def absorbed_conv(e: pd.DataFrame) -> float:
        """Mass in CONV after ``iters`` power steps from START=1."""
        states = sorted(set(e["prev"]) | set(e["cur"]) | {START, CONV, NULLS})
        idx = {s: i for i, s in enumerate(states)}
        src = e["prev"].map(idx).to_numpy(np.int64)
        dst = e["cur"].map(idx).to_numpy(np.int64)
        cnt = e["n"].to_numpy(np.float64)
        tot = np.bincount(src, weights=cnt, minlength=len(states))
        w = cnt / tot[src]
        absorbing = np.zeros(len(states), dtype=bool)
        absorbing[[idx[CONV], idx[NULLS]]] = True
        m = np.zeros(len(states)); m[idx[START]] = 1.0
        for _ in range(iters):
            inflow = np.bincount(dst, weights=m[src] * w, minlength=len(states))
            m = np.where(absorbing, m + inflow, inflow)
        return float(m[idx[CONV]])

    base = absorbed_conv(edges)
    sc = 10.0 ** round_to
    effects = []
    for c in channels:
        e = edges[edges["prev"] != c].copy()
        e["cur"] = e["cur"].where(e["cur"] != c, NULLS)
        e = e.groupby(["prev", "cur"], sort=False, as_index=False)["n"].sum()
        if base > 0:
            eff = 1.0 - absorbed_conv(e) / base
            effects.append(np.sign(eff) * np.floor(abs(eff) * sc + 0.5) / sc)
        else:
            effects.append(np.nan)
    return pd.DataFrame({"channel": pd.array(channels, dtype="string"),
                         "removal_effect": np.array(effects, dtype=np.float64)})
