"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line.

``--scaling``: run the headline pipeline twice in FRESH processes at
two CPU widths on the same input (page cache warmed by an untimed
run) and report both throughputs plus scaling efficiency — the
sandbox substitute for the north rule's N vs 4N cluster-size
criterion. ``--scaling-minhash`` / ``--scaling-asof``: the same
4-vs-16 probe over the shuffle-heaviest headliner (minhash_dedup)
and the north rule's centerpiece (bucketed hot-entity-salted
asof_join at a 64M+ spine; ASOF_LEFT_ROWS/ASOF_RIGHT_ROWS resize).
``--ivf-probe``: per-query-batch cost of the bucket-partitioned IVF
reuse path vs probed volume (IVF_VECTORS resizes). Single-level
probes: ``--scale-probe`` / ``--minhash-probe`` / ``--asof-probe``
(RAY_GRAFT_CPUS sets the width).
"""

from __future__ import annotations

import json
import os
import sys
import time


def consume(ds) -> int:
    """Execute the full pipeline and count rows WITHOUT funneling block
    bytes through the driver (iter_batches would deserialize the whole
    output — including image payloads — single-threaded on the driver,
    which was measured to dominate and flatten scaling). Iterating the
    ref bundles executes every stage; blocks stay in the object store,
    like a distributed sink would see them."""
    n = 0
    for bundle in ds.iter_internal_ref_bundles():
        n += bundle.num_rows() or 0
    return int(n)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # NOTE: the sf0.1 headline pipelines keep Ray's default sort-based
    # shuffle — their exchanges are ~100k rows and cannot amortize the
    # hash-shuffle aggregator actor pool (measured: asof_bucketed
    # 3.6 s -> 29.6 s with hash shuffle ON at this scale). The
    # compute-dominated scale probe (run_scale_probe) uses
    # tuning.configure_exchange, where the hash exchange wins.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from temporalscope_ray.pipelines.flagship import image_feature_pipeline, image_table_for, temporal_feature_pipeline
    from temporalscope_ray.stages.asof import asof_join
    from temporalscope_ray.stages.dedup import minhash_dedup
    from temporalscope_ray.stages.similarity import knn_brute
    import numpy as np
    import ray.data

    queries: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn, repeats: int = 2):
        """Best-of-N: the shared sandbox host shows up to 2x run-to-run
        noise; the minimum is the least-contended measurement."""
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        counts[name] = n

    image_table_for(sf_dir)  # materialize the image table outside the timed region

    pool = max(8, num_cpus - 4)  # actor-pool budget: leave headroom for read/map tasks
    timed("flagship", lambda: consume(
        temporal_feature_pipeline(sf_dir, num_buckets=max(32, num_cpus * 2), concurrency=pool)))
    timed("image_pipeline", lambda: consume(
        image_feature_pipeline(sf_dir, num_buckets=max(32, num_cpus * 2), concurrency=pool)))

    import __ray_entry__ as entrymod

    timed("asof_bucketed", lambda: consume(entrymod.q_asof_bucketed(sf_dir)))

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    timed("minhash_dedup", lambda: consume(minhash_dedup(docs, text_col="text", id_col="doc_id")))

    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    head = emb.take(16)
    qmat = np.stack([r["embedding"] for r in head]).astype(np.float64)
    timed("knn_brute", lambda: len(knn_brute(emb, qmat, k=10)))

    ray.shutdown()
    total = round(sum(queries.values()), 3)
    return {
        "metric": "headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "rows": counts,
        # the north-rule headline: images/sec end-to-end through the
        # image feature pipeline (as-of/window features + decode)
        "images_per_sec": round(counts["image_pipeline"] / queries["image_pipeline"], 1),
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


# 64M rows (was 16M in rounds 1-2): the xl probe measures SCALING, and
# at 16M the per-JOB fixed costs (detect scan, input-cache materialize,
# plan/exchange latency — ~2-2.5 s regardless of width) are ~17% of the
# 16-cpu wall, structurally capping the ratio at ~0.55 no matter how
# well the per-byte work scales. At 64M the same fixed costs are ~9%
# and the measured main-pass efficiency (0.81) dominates — the honest
# proxy for 100 TB jobs, where per-job costs amortize to nothing.
XL_ROWS = 64_000_000
# 400k (round 4): after the batched image kernel removed ~55% of the
# per-image CPU, the ~1.5-2 s per-pass fixed costs were ~30% of the
# 16-cpu wall at 100k images, structurally capping the measured ratio
# at ~0.7 — the same distortion the 16M->64M xl move fixed in round 3,
# with the same argument: a 100 TB job's per-pass costs amortize to
# nothing, so the probe must be big enough that per-byte work
# dominates at the WIDE level too.
SCALE_IMAGES = 400_000
MINHASH_DOCS = int(os.environ.get("MINHASH_DOCS", 8_000_000))


def run_scale_probe(num_cpus: int) -> dict:
    """Best-of-2 timed passes of the compute-dominated scaling workload:
    the flagship temporal-feature+label pass over a 64M-row synthetic
    events table, plus the image pipeline (decode-bound) over a
    100k-image table. Inputs are cached parquet (generated in the
    untimed warm-up run).

    Best-of-2 IN-PROCESS (same policy as run_bench's timed()): the
    first pass pays one-time worker-pool startup — Ray spawns
    ``num_cpus`` worker processes, each importing ray+pandas+this
    package via the setup hook — a per-SESSION cost that hits the wide
    level ~4× harder than the narrow one and is exactly what the
    scaling criterion must NOT measure (a real cluster's workers are
    long-lived across a 100 TB job). Measured: 16-cpu xl passes within
    one session read 66/37/26 s — the first pass is startup+page-cache,
    the floor is the honest per-pass cost."""
    import ray

    # worker_process_setup_hook: the vectorized shuffle partitioner must be
    # patched into TASK WORKER processes too (see tuning.install_fast_hash_partition).
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": repo_dir},
                          "worker_process_setup_hook":
                          "temporalscope_ray.tuning.install_fast_hash_partition"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from temporalscope_ray.tuning import configure_exchange

    configure_exchange(num_cpus)
    import pandas as pd
    import ray.data

    from temporalscope_ray import synth
    from temporalscope_ray.pipelines.flagship import image_feature_pipeline, image_table_for
    from temporalscope_ray.stages.window_features import add_temporal_features_auto

    xl_path = synth.materialize_events_table(f"/tmp/tsray_events_xl_{XL_ROWS}", XL_ROWS, num_blocks=64)
    img_path = synth.materialize_image_table(
        f"/tmp/tsray_image_tables_v2/scale_{SCALE_IMAGES}", SCALE_IMAGES,
        num_entities=SCALE_IMAGES // 50, seed=42, num_blocks=64,
    )

    from temporalscope_ray.pipelines.flagship import image_pipeline_over

    queries: dict[str, float] = {}
    rows = images = 0
    for _rep in range(2):
        ev = ray.data.read_parquet(xl_path, columns=["event_id", "ts", "user_id", "value"])
        t0 = time.perf_counter()
        rows = consume(
            add_temporal_features_auto(
                ev, id_col="user_id", time_col="ts", value_cols=["value"], lags=[1, 2],
                rolling_windows=[4], rolling_fns=("mean", "sum"), session_gap=pd.Timedelta("30min"),
                label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
                num_buckets=128, tiebreak=["event_id"],
            )
        )
        dt = round(time.perf_counter() - t0, 3)
        queries["xl_flagship"] = min(queries.get("xl_flagship", dt), dt)

        t0 = time.perf_counter()
        images = consume(
            image_pipeline_over(img_path, num_buckets=64, concurrency=max(4, num_cpus - 4))
        )
        dt = round(time.perf_counter() - t0, 3)
        queries["image_pipeline"] = min(queries.get("image_pipeline", dt), dt)

    ray.shutdown()
    total = round(sum(queries.values()), 3)
    return {"value": total, "queries": queries, "rows": {"xl_flagship": rows, "image_pipeline": images},
            "num_cpus": num_cpus}


def run_minhash_probe(num_cpus: int) -> dict:
    """Best-of-2 timed passes of minhash_dedup — the shuffle-heaviest
    headliner — over a cached synthetic MINHASH_DOCS-row documents
    table with planted near-dup structure (VERDICT r3 #6: the scaling
    table only probed image+flagship). Same measurement policy as
    run_scale_probe: fresh process per level, best-of-2 in-process so
    one-time worker-pool startup (a per-SESSION cost a 100 TB cluster
    job amortizes) is not measured."""
    import ray

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": repo_dir},
                          "worker_process_setup_hook":
                          "temporalscope_ray.tuning.install_fast_hash_partition"})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, repo_dir)
    # MINHASH_SORT_EXCHANGE=1: control mode — keep Ray's default
    # sort-based shuffle at BOTH widths. The hash-shuffle aggregator
    # pool reserves width-proportional CPUs (num_cpus//2 aggregators),
    # which at the 4-cpu narrow level eats half the width and inflates
    # the measured ratio; the control isolates that artifact.
    if os.environ.get("MINHASH_SORT_EXCHANGE") != "1":
        from temporalscope_ray.tuning import configure_exchange

        configure_exchange(num_cpus)
    import ray.data

    from temporalscope_ray import synth
    from temporalscope_ray.stages.dedup import minhash_dedup

    path = synth.materialize_documents_table(
        f"/tmp/tsray_docs_xl_{MINHASH_DOCS}", MINHASH_DOCS, num_blocks=64)

    best, kept = None, 0
    for _rep in range(2):
        docs = ray.data.read_parquet(path)
        t0 = time.perf_counter()
        # (n, n) tuple = fixed-size pool sized to the probe width,
        # bypassing clamp_concurrency's avail-4 safety clamp (which at
        # the 4-cpu level collapses any int concurrency to ONE actor —
        # near-serial narrow level, dishonestly inflated ratio). A
        # bare autoscaling (1, n) tuple was ALSO measured stuck at one
        # actor at this width; the fixed pair pins the pool at both
        # levels to the same width-proportional rule.
        # n-4 leaves CPU for read tasks + the hash-shuffle aggregator
        # pool at the wide level ((n-2, n-2) at 16 cpus oversubscribed:
        # 14 actors + 8 aggregators > 16 -> the pool never reached its
        # fixed min and the pass hung); floor 2 keeps the narrow level
        # parallel past the avail-4 clamp that collapsed it to 1.
        pool = max(2, num_cpus - 4)
        kept = consume(minhash_dedup(
            docs, text_col="text", id_col="doc_id",
            concurrency=(pool, pool)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ray.shutdown()
    return {"value": round(best, 3), "queries": {"minhash_dedup_xl": round(best, 3)},
            "rows": {"minhash_dedup_xl": kept},
            "docs_per_sec": round(MINHASH_DOCS / best, 1), "num_cpus": num_cpus}


ASOF_LEFT_ROWS = int(os.environ.get("ASOF_LEFT_ROWS", 64_000_000))
ASOF_RIGHT_ROWS = int(os.environ.get("ASOF_RIGHT_ROWS", 8_000_000))


def run_asof_probe(num_cpus: int) -> dict:
    """Best-of-2 timed passes of the north rule's centerpiece — the
    bucketed point-in-time as-of join — at scale (VERDICT r4 #2: the
    scaling table covered image/flagship/minhash, never the asof
    family). 64M-row Zipf-skewed event spine joined as-of against an
    8M-row reference stream over the same 640k-user space, FORCED
    bucketed path (broadcast=False) with the generator's hottest
    entity salted across 8 buckets — the exact skew machinery the
    north rule names. Inputs are cached parquet (built untimed);
    same measurement policy as run_scale_probe (fresh process per
    level, in-process best-of-2 absorbs worker-pool startup)."""
    import ray

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": repo_dir},
                          "worker_process_setup_hook":
                          "temporalscope_ray.tuning.install_fast_hash_partition"})
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Winning config from the round-5 block/exchange scan (every run in
    # BASELINE.md): 32 big blocks + 32 buckets + Ray's default SORT
    # shuffle — 6.72 s at 16 cpus vs 14.3 s for the first config
    # (hash exchange, 256 small blocks, 128 buckets). The byte-heavy,
    # compute-light asof exchange is dominated by per-block scheduling
    # and object churn, not partitioning CPU: fewer/bigger blocks beat
    # every hash-exchange variant (aggregators 4/8/12 all slower), the
    # OPPOSITE of the compute-dominated flagship/minhash exchanges.
    # ASOF_HASH_EXCHANGE=1 = control mode (the losing strategy).
    ctx.target_max_block_size = 256 * 1024 * 1024
    sys.path.insert(0, repo_dir)
    if os.environ.get("ASOF_HASH_EXCHANGE") == "1":
        from temporalscope_ray.tuning import configure_exchange

        configure_exchange(num_cpus)
    import ray.data

    from temporalscope_ray import synth
    from temporalscope_ray.stages.asof import asof_join

    n_users = max(1, ASOF_LEFT_ROWS // 100)
    left_path = synth.materialize_events_table(
        f"/tmp/tsray_events_xl_{ASOF_LEFT_ROWS}", ASOF_LEFT_ROWS, num_blocks=64)
    right_path = synth.materialize_events_table(
        f"/tmp/tsray_asof_right_{ASOF_RIGHT_ROWS}", ASOF_RIGHT_ROWS,
        num_users=n_users, seed=77, num_blocks=64)

    best, rows = None, 0
    for _rep in range(2):
        left = ray.data.read_parquet(
            left_path, columns=["event_id", "ts", "user_id", "value"],
            override_num_blocks=32)
        right = ray.data.read_parquet(
            right_path, columns=["ts", "user_id", "value"],
            override_num_blocks=8)
        t0 = time.perf_counter()
        # user 0 is the Zipf-hottest entity by construction
        # (synth.zipf_entity_offsets)
        out = asof_join(
            left, right, on="ts", by="user_id", right_cols=["value"],
            suffix="_ref", broadcast=False, num_buckets=32,
            hot_entities=[0], num_salts=8,
        )
        rows = consume(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    ray.shutdown()
    return {"value": round(best, 3), "queries": {"asof_xl": round(best, 3)},
            "rows": {"asof_xl": rows},
            "rows_per_sec": round(ASOF_LEFT_ROWS / best, 1), "num_cpus": num_cpus}


def run_scaling_asof() -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--asof-probe"], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo, n_hi = 4, 16
    lo = one(n_lo)
    hi = one(n_hi)
    eff = round((lo["value"] / hi["value"]) / (n_hi / n_lo), 3)
    return {
        "metric": f"bucketed asof_join scaling efficiency ({n_lo} -> {n_hi} cpus)",
        "value": eff, "unit": "efficiency",
        "num_cpus_lo": n_lo, "num_cpus_hi": n_hi,
        "sec_lo": lo["value"], "sec_hi": hi["value"],
        "rows_per_sec_lo": lo["rows_per_sec"], "rows_per_sec_hi": hi["rows_per_sec"],
        "workload": f"asof_join({ASOF_LEFT_ROWS} spine x {ASOF_RIGHT_ROWS} ref, "
                    "bucketed, hot-entity salted)",
    }


IVF_VECTORS = int(os.environ.get("IVF_VECTORS", 1_000_000))


def run_ivf_probe(num_cpus: int) -> dict:
    """Evidence for the round-4 verdict weak item: on a
    bucket-partitioned ``IvfIndex`` (1M × 32-dim vectors, nlist=64),
    per-query-batch cost must scale with PROBED volume (nprobe/nlist),
    not index size. Times repeated query batches at nprobe = 1 / 8 /
    64(=full) against the partitioned index, plus the old
    unpartitioned groupby path at nprobe=1 as the contrast (it
    re-shuffles ALL vectors per call regardless of nprobe). Reports
    the median of 3 calls per configuration — the reuse API's steady
    state; the first call at each config additionally warms the
    worker-local object cache exactly as a serving deployment would."""
    import statistics

    import numpy as np
    import ray

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"env_vars": {"PYTHONPATH": repo_dir}})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, repo_dir)
    import ray.data

    from temporalscope_ray import synth
    from temporalscope_ray.stages.similarity import (
        IvfIndex, build_ivf_index, query_ivf_index)

    nlist = 64
    path = synth.materialize_embeddings_table(
        f"/tmp/tsray_emb_xl_{IVF_VECTORS}", IVF_VECTORS, dim=32, num_blocks=64)
    emb = ray.data.read_parquet(path)
    queries = np.stack([r["embedding"] for r in emb.take(8)]).astype(np.float64)

    t0 = time.perf_counter()
    index = build_ivf_index(emb, nlist=nlist, train_sample=4096,
                            concurrency=max(4, num_cpus - 4))
    build_sec = round(time.perf_counter() - t0, 3)

    def timed_calls(idx, nprobe: int, calls: int = 3) -> list[float]:
        out = []
        for _ in range(calls):
            t0 = time.perf_counter()
            res = query_ivf_index(idx, queries, k=10, nprobe=nprobe)
            out.append(round(time.perf_counter() - t0, 3))
            assert len(res) > 0
        return out

    probes = {}
    for nprobe in (1, 8, nlist):
        calls = timed_calls(index, nprobe)
        probes[f"partitioned_nprobe_{nprobe}"] = {
            "calls": calls, "median": round(statistics.median(calls), 3)}
    unpart = IvfIndex(index.centroids, index.assignments, index.emb_col, index.id_col)
    calls = timed_calls(unpart, 1)
    probes["unpartitioned_nprobe_1"] = {
        "calls": calls, "median": round(statistics.median(calls), 3)}

    ray.shutdown()
    full = probes[f"partitioned_nprobe_{nlist}"]["median"]
    one = probes["partitioned_nprobe_1"]["median"]
    return {
        "metric": "ivf reuse query cost vs probed volume",
        "vectors": IVF_VECTORS, "dim": 32, "nlist": nlist,
        "build_sec": build_sec, "probes": probes,
        "nprobe1_over_full": round(one / full, 3) if full else None,
        "num_cpus": num_cpus,
    }


def run_scaling_minhash() -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--minhash-probe"], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    n_lo, n_hi = 4, 16
    # one process per level: the corpus build inside the probe is
    # untimed, and the in-process best-of-2 already absorbs worker-pool
    # startup + page-cache cold reads (the narrow level's passes run
    # ~6 min each at 2M docs — a second full process per level doubles
    # an already-long wall for noise protection the in-process minimum
    # provides).
    lo = one(n_lo)
    hi = one(n_hi)
    eff = round((lo["value"] / hi["value"]) / (n_hi / n_lo), 3)
    return {
        "metric": f"minhash_dedup scaling efficiency ({n_lo} -> {n_hi} cpus)",
        "value": eff, "unit": "efficiency",
        "num_cpus_lo": n_lo, "num_cpus_hi": n_hi,
        "sec_lo": lo["value"], "sec_hi": hi["value"],
        "docs_per_sec_lo": lo["docs_per_sec"], "docs_per_sec_hi": hi["docs_per_sec"],
        "workload": f"minhash_dedup({MINHASH_DOCS} docs, planted near-dups)",
    }


def run_scaling(sf_dir: str) -> dict:
    import subprocess

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-probe"], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N=4 vs 4N=16: this sandbox VM's memory bandwidth saturates around
    # ~16 concurrent heavy workers (8->32 measures saturation, not
    # scaling) and run-to-run variance is high (shared host), so take
    # the best of two runs per level after an untimed warm-up.
    n_lo, n_hi = 4, 16
    one(n_lo)  # warm page cache + build cached inputs, untimed
    lo = min(one(n_lo), one(n_lo), key=lambda r: r["value"])
    hi = min(one(n_hi), one(n_hi), key=lambda r: r["value"])
    # throughput = work/sec; same work at both levels → tput ratio = t_lo/t_hi
    per_query_eff = {
        q: round((lo["queries"][q] / hi["queries"][q]) / (n_hi / n_lo), 3) for q in lo["queries"]
    }
    # headline = the north-star metric: images/sec through the image
    # feature pipeline (as-of/window features + decode)
    headline_eff = per_query_eff["image_pipeline"]
    return {
        "metric": f"scaling efficiency ({n_lo} -> {n_hi} cpus), headline = image pipeline images/sec",
        "value": headline_eff,
        "unit": "efficiency",
        "num_cpus_lo": n_lo,
        "num_cpus_hi": n_hi,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "images_per_sec_lo": round(lo["rows"]["image_pipeline"] / lo["queries"]["image_pipeline"], 1),
        "images_per_sec_hi": round(hi["rows"]["image_pipeline"] / hi["queries"]["image_pipeline"], 1),
        "per_query_efficiency": per_query_eff,
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
        "workload": f"image_pipeline({SCALE_IMAGES} images) + xl_flagship({XL_ROWS} rows)",
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    elif "--scaling-minhash" in sys.argv:
        print(json.dumps(run_scaling_minhash()))
    elif "--scaling-asof" in sys.argv:
        print(json.dumps(run_scaling_asof()))
    elif "--asof-probe" in sys.argv:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_asof_probe(num_cpus)))
    elif "--ivf-probe" in sys.argv:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_ivf_probe(num_cpus)))
    elif "--minhash-probe" in sys.argv:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_minhash_probe(num_cpus)))
    elif "--scale-probe" in sys.argv:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_scale_probe(num_cpus)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
