"""Replay SELECTED queries on an adversarial corpus — the targeted
debugging companion to adv_sweep.py (same compare: sorted columns,
unit-normalized datetimes, rtol 1e-7). Use while fixing a divergence
so each iteration costs seconds, not a full 232-query sweep.

Usage: python adv_replay.py <corpus_dir> <query_name> [more names...]
(build the corpus first with `python adv_sweep.py <axis>` — e.g.
/tmp/sf_adv_dtype from the dtype axis)
"""
import sys, os
import duckdb, numpy as np, pandas as pd, pyarrow as pa
DST = sys.argv[1]
names = sys.argv[2:]
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
bad = 0
for name in names:
    try:
        r = qs[name](DST)
        rdf = r.to_pandas() if hasattr(r, "to_pandas") else r
        if isinstance(rdf, pa.Table): rdf = rdf.to_pandas()
        odf = con.execute(oracles[name]).df()
        key = sorted(rdf.columns)
        if sorted(odf.columns) != key:
            print(f"SCHEMA {name}: {sorted(odf.columns)} vs {key}"); bad += 1; continue
        if len(rdf) != len(odf):
            print(f"ROWS {name}: {len(rdf)} vs {len(odf)}"); bad += 1; continue
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
            print(f"OK {name}")
        except AssertionError as ex:
            print(f"MISMATCH {name}: {str(ex).splitlines()[-1][:150]}"); bad += 1
    except Exception as ex:
        print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:150]}"); bad += 1
ray.shutdown()
sys.exit(1 if bad else 0)
