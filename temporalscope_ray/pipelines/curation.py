"""Corpus curation flagship: the composition every pretraining data
pipeline runs — PII redaction → repetition quality gate (Gopher
signals) → MinHash near-dup dedup — each stage individually
oracle-gated, composed here into one streaming plan.

Scale shape: redaction and the quality gate are embarrassingly
parallel actor-pool map_batches (no exchange); only the MinHash stage
shuffles, and it moves (band, id) rows — never text ×bands. Nothing
corpus-sized touches the driver at any point.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def curate_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=8,
    portable: bool = False,
) -> ray.data.Dataset:
    """Returns the curated corpus as (id, redacted text) rows: PII
    masked, repetition-gate failures dropped, near-duplicates removed
    (smallest id of each duplicate cluster survives)."""
    from ..stages.dedup import minhash_dedup
    from ..stages.text import add_pii_redaction, add_repetition_stats

    red = add_pii_redaction(ds.select_columns([id_col, text_col]), text_col,
                            concurrency=concurrency)
    red = red.map_batches(
        lambda b: pd.DataFrame({id_col: b[id_col].to_numpy(),
                                text_col: b["text_redacted"].to_numpy()}),
        batch_format="pandas",
    )
    stats = add_repetition_stats(red, text_col, concurrency=concurrency)
    kept = stats.map_batches(
        lambda b: b.loc[b["keep"].to_numpy(), [id_col, text_col]],
        batch_format="pandas",
    )
    return minhash_dedup(kept, text_col=text_col, id_col=id_col,
                         concurrency=concurrency, portable=portable)
