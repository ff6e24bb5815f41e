"""Tutorial 5 — Web-corpus curation at scale (beyond the reference).

The standard pretraining-data pass composed from this repo's
oracle-gated stages: PII redaction → repetition quality gate (Gopher
signals) → MinHash near-dup dedup — plus the per-document corpus-LM
quality score. Everything streams: text crosses exactly one exchange
(the MinHash banding) and nothing corpus-sized reaches the driver.

Run: ``PYTHONPATH=. python examples/05_corpus_curation.py``
"""

import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.pipelines.curation import curate_documents
    from temporalscope_ray.stages.text import ngram_lm_scores

    # a tiny corpus with the failure modes curation must catch
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "the quick brown fox jumps over the lazy dog and keeps running through the field",
            "the quick brown fox jumps over the lazy dog and keeps running through the woods",
            "contact me at jane.doe@example.com or 555-123-4567 for more details and context",
            "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam",
            "a genuinely informative document about distributed data processing with ray data",
            "another unique document discussing arrow batches actor pools and shuffle planning",
        ],
    })
    ds = ray.data.from_pandas(docs)

    curated = curate_documents(ds, concurrency=2).to_pandas().sort_values("doc_id")
    print("kept after curation:", sorted(curated["doc_id"].tolist()))
    # - doc 1 (near-dup of 0) removed by MinHash
    # - doc 3 (one word repeated) removed by the repetition gate
    # - doc 2 kept, but with its email/phone masked:
    print(curated.set_index("doc_id").loc[2, "text"])

    scores = ngram_lm_scores(ds, num_buckets=4).to_pandas().sort_values("lm_score")
    print(scores.to_string(index=False))


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
