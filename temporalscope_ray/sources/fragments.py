"""Fragment-aware parquet reading — the Lance-style storage abstraction.

Lance addresses rows by (fragment id, row offset); this environment has
parquet only, so the same provenance is reconstructed here: the driver
enumerates fragments (files) via ``pyarrow.dataset``, and one read task
per fragment emits the rows WITH their lineage columns
``__fragment_id__`` (int32) and ``__row_start__`` (int64 offset of the
row within its fragment). Column pruning is preserved
(``columns=[...]`` reads only those + nothing else from storage).

Downstream, `state.lineage.run_partitioned` picks these columns up
automatically and records, per output partition, exactly which input
fragments and row ranges produced it — the north rule's
"(input fragment ids, row ranges)" lineage fields — then drops them
from the written output.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data

FRAGMENT_COL = "__fragment_id__"
ROW_START_COL = "__row_start__"


def list_fragments(paths: str | Sequence[str]) -> list[dict]:
    """Driver-side fragment manifest: (fragment_id, path, num_rows)."""
    dset = pads.dataset(paths, format="parquet")
    out = []
    for i, frag in enumerate(dset.get_fragments()):
        out.append({"fragment_id": i, "path": frag.path, "num_rows": frag.count_rows()})
    return out


def read_parquet_fragments(
    paths: str | Sequence[str],
    *,
    columns: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Parquet read where every row knows its (fragment id, row offset)."""
    specs = list_fragments(paths)
    cols = list(columns) if columns is not None else None

    def read_frag(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            t = pq.read_table(spec["path"], columns=cols)
            n = t.num_rows
            t = t.append_column(FRAGMENT_COL, pa.array(np.full(n, spec["fragment_id"], dtype=np.int32)))
            t = t.append_column(ROW_START_COL, pa.array(np.arange(n, dtype=np.int64)))
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(specs).map_batches(read_frag, batch_format="pyarrow", batch_size=1)
