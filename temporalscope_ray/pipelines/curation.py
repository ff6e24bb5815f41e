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


def curate_image_corpus(
    images: ray.data.Dataset,
    *,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    hamming_threshold: int = 3,
    salt: str = "neg",
    num_buckets: int = 16,
    concurrency=4,
    gate_kwargs=None,
    portable: bool = False,
) -> ray.data.Dataset:
    """Image-corpus curation + contrastive training-set construction —
    the north-rule composition over the ``(image_id, bytes, w, h, fmt,
    caption, phash)`` table: LAION-style caption/metadata gate →
    perceptual-hash near-dup dedup → dense re-index → deterministic
    negative pairing. Returns CLIP-ready triplets ``(image_id, caption,
    idx, neg_idx, neg_image_id, neg_caption)``.

    ``id_col`` must be UNIQUE per image (the dedup keep-smallest rule
    and the dense index both key on it) — the synthetic image table's
    ``image_id`` is an entity key over an (id, ts) series, so derive a
    per-row id (e.g. ``image_id @ ts``) before curating that table.

    Scale shape: the gate is a zero-shuffle metadata pass (bytes never
    decoded); phash dedup moves only (id, chunk, hash) rows through
    its one exchange — payloads never shuffle; the dense index is the
    O(blocks) two-pass scan; the negative fetch is the size-adaptive
    equi-join. Each stage is individually oracle-gated; the composed
    plan is gated end-to-end by the ``image_curation_pipeline`` query.
    """
    from ..stages.dedup import phash_dedup
    from ..stages.multimodal import caption_image_gate
    from ..stages.sampling import negative_pair
    from ..stages.scan import with_global_index

    gated = caption_image_gate(images, caption_col=caption_col,
                               **(gate_kwargs or {}))
    kept = gated.filter(expr="keep == 1")
    dd = phash_dedup(kept, hash_col=phash_col, id_col=id_col,
                     hamming_threshold=hamming_threshold,
                     concurrency=concurrency, num_buckets=num_buckets)
    slim = dd.map_batches(lambda t: t.select([id_col, caption_col]),
                          batch_format="pyarrow", zero_copy_batch=True)
    idx = with_global_index(slim, order_by=[id_col], out_col="idx").materialize()
    n = idx.count()
    if n < 2:
        return idx
    return negative_pair(idx, "idx", [id_col, caption_col], n=n, salt=salt,
                         num_buckets=num_buckets, portable=portable)
