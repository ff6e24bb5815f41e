"""Text analysis stages for large-scale corpus curation: token/char
stats, quality scoring, language ID, document fingerprinting.

All stages are actor-pool ``map_batches`` classes — regexes and
stopword tables compile ONCE per actor in ``__init__`` and every batch
is processed with vectorized pandas string ops. Designed for the
``documents`` table (``doc_id, text, lang, source, n_chars``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .grouped import clamp_concurrency

# tiny built-in stopword lists (public, common words) for the n-gram /
# stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "nicht", "mit", "ein", "auf", "für"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "sur", "avec"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "en", "que", "por", "con", "para"},
}

# Engine-wide PORTABLE tokenization classes — explicit ASCII sets that
# Python ``re`` and DuckDB's RE2 interpret IDENTICALLY. Python's
# \w / \s / \S are unicode-aware while RE2's are ASCII-only
# (\w = [0-9A-Za-z_], \s = [\t\n\f\r ]), so a bare ``\w+`` silently
# diverges from the SQL oracle on the first non-ASCII document
# (caught by adv_sweep.py's unicode doc: 'émojis' → ['émojis'] in
# Python vs ['mojis'] in RE2).
ASCII_WORD_RE = r"[A-Za-z0-9_]+"       # == RE2 \w+
ASCII_NONSPACE_RE = r"[^\t\n\f\r ]+"   # == RE2 \S+

TOKEN_RE = ASCII_NONSPACE_RE  # whitespace tokenization (oracle: regexp_extract_all(text,'\S+'))
WORD_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\t\n\f\r ]"  # BPE-ish: words + single punctuation marks (oracle: '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')


class TextStats:
    """Per-document statistics + quality score.

    Adds ``n_chars_calc, n_tokens, n_words, avg_token_len, punct_ratio,
    digit_ratio, upper_ratio, stopword_ratio, quality_score``.
    Quality score = weighted mix of length/punct/stopword signals in
    [0, 1] (heuristic, monotone in "looks like prose").
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token_re = re.compile(TOKEN_RE)
        self.word_re = re.compile(WORD_RE)
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.findall(self.token_re)
        words = s.str.findall(self.word_re)
        n_chars = s.str.len().astype("int64")
        n_tokens = toks.str.len().astype("int64")
        n_words = words.str.len().astype("int64")
        total_len = toks.map(lambda ts: sum(len(t) for t in ts))
        batch["n_chars_calc"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["n_words"] = n_words
        batch["avg_token_len"] = np.where(n_tokens > 0, total_len / n_tokens.clip(lower=1), 0.0)
        batch["punct_ratio"] = np.where(
            n_chars > 0, s.str.count(r"[^\w\s]") / n_chars.clip(lower=1), 0.0
        )
        batch["digit_ratio"] = np.where(n_chars > 0, s.str.count(r"\d") / n_chars.clip(lower=1), 0.0)
        batch["upper_ratio"] = np.where(n_chars > 0, s.str.count(r"[A-Z]") / n_chars.clip(lower=1), 0.0)
        stop = self.stop_en
        batch["stopword_ratio"] = toks.map(
            lambda ts: (sum(t.lower() in stop for t in ts) / len(ts)) if ts else 0.0
        )
        # quality: prose-ish docs have moderate token length, some
        # stopwords, low digit/punct density, non-trivial length
        length_score = np.clip(n_tokens / 50.0, 0, 1)
        batch["quality_score"] = (
            0.35 * length_score
            + 0.3 * np.clip(batch["stopword_ratio"] * 4, 0, 1)
            + 0.2 * (1 - np.clip(batch["punct_ratio"] * 5, 0, 1))
            + 0.15 * (1 - np.clip(batch["digit_ratio"] * 5, 0, 1))
        )
        return batch


class LangId:
    """Stopword-overlap language heuristic over {en, de, fr, es}.

    Adds ``lang_pred`` and ``lang_score`` (fraction of tokens hitting
    the winning language's stopword table; ``und`` = undetermined when
    no table scores > 0).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token_re = re.compile(r"[a-zA-ZäöüßéèêàçñÁ-ÿ]+")
        self.tables = {k: v for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: explode tokens once, one isin() pass per language
        # table (C-speed), then a groupby-mean back to doc rows — no
        # per-document Python loop
        s = batch[self.text_col].fillna("")
        toks = s.str.findall(self.token_re)
        n_toks = toks.str.len().to_numpy()
        doc_idx = np.repeat(np.arange(len(batch)), n_toks)
        flat = pd.Series(
            [t for ts in toks for t in ts], dtype=object
        ).str.lower() if len(doc_idx) else pd.Series([], dtype=object)
        scores = np.zeros((len(batch), len(self.tables)))
        langs = list(self.tables)
        for li, lang in enumerate(langs):
            hit = flat.isin(self.tables[lang]).to_numpy() if len(doc_idx) else np.array([], dtype=bool)
            hits_per_doc = np.bincount(doc_idx, weights=hit, minlength=len(batch))
            scores[:, li] = np.divide(
                hits_per_doc, n_toks, out=np.zeros(len(batch)), where=n_toks > 0
            )
        best_li = scores.argmax(axis=1)
        best = scores[np.arange(len(batch)), best_li]
        batch["lang_pred"] = np.where(best > 0, np.array(langs, dtype=object)[best_li], "und")
        batch["lang_score"] = best
        return batch


class Fingerprint:
    """64-bit content fingerprint of the normalized text (lowercased,
    whitespace collapsed) -> ``fingerprint`` int64 column. Deterministic
    across processes (``pd.util.hash_array`` uses a fixed key) and fully
    vectorized — normalization via pandas str kernels, hashing in C, no
    per-character Python loop."""

    def __init__(self, text_col: str = "text", *, portable: bool = False):
        # portable=True hashes with md5-lower-64 — slower, but replicable
        # by any SQL engine (md5_number_lower of the same normalization)
        self.text_col = text_col
        self.portable = portable

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # lower → collapse ASCII whitespace runs → trim spaces: the exact
        # sequence of the SQL replay (trim(regexp_replace(lower(x),
        # '\s+', ' ', 'g'))). The whitespace class is the explicit RE2
        # set — Python's \s would also collapse unicode spaces (U+3000,
        # NBSP) that RE2 leaves alone, forking the fingerprint.
        norm = (
            batch[self.text_col].fillna("").str.lower()
            .str.replace(r"[\t\n\f\r ]+", " ", regex=True).str.strip(" ")
        )
        if self.portable:
            from .dedup import _md5_lower64

            h = _md5_lower64(norm)
        else:
            h = pd.util.hash_array(norm.to_numpy(dtype=object))
        batch["fingerprint"] = h.astype(np.int64)  # wrap-around view: stable, sign-agnostic
        return batch


class RepetitionStats:
    """Gopher-style word-repetition quality signals per document —
    the standard web-corpus repetition filter family (Rae et al. 2021,
    "Scaling Language Models", Table A1): documents dominated by a few
    repeated words/phrases are boilerplate or spam.

    Tokenization is the engine-wide portable convention (ASCII ``[A-Za-z0-9_]+``
    == RE2 ``\\w+`` over lowered text). Adds:

    - ``n_words``            token count
    - ``distinct_word_frac`` distinct words / words
    - ``top_word_frac``      occurrences of the most common word / words
    - ``dup_word_frac``      fraction of word occurrences whose word
      appears more than once in the document
    - ``top_bigram_frac``    occurrences of the most common adjacent
      word pair / (words - 1)
    - ``keep``               boolean quality gate (thresholds are
      constructor parameters; a doc with zero words is never kept)

    Fractions are exact IEEE divisions of integer counts (no rounding)
    so they bit-match a SQL oracle computing the same ratios; a doc
    with zero words (or < 2 for bigrams) gets null fractions, matching
    SQL NULL. Fully vectorized: tokens are exploded once per batch,
    per-(doc, word) counts come from one ``np.unique`` over a combined
    int64 key, bigrams from shifted-array concat masked at document
    boundaries — no per-document Python loop. Runs as an actor pool so
    the regex compiles once per actor.
    """

    def __init__(
        self,
        text_col: str = "text",
        *,
        max_top_word_frac: float = 0.10,
        max_dup_word_frac: float = 0.85,
        max_top_bigram_frac: float = 0.20,
    ):
        self.text_col = text_col
        self.max_top_word_frac = max_top_word_frac
        self.max_dup_word_frac = max_dup_word_frac
        self.max_top_bigram_frac = max_top_bigram_frac
        self.token_re = re.compile(ASCII_WORD_RE)

    @staticmethod
    def _per_doc_counts(doc: np.ndarray, codes: np.ndarray, n_rows: int):
        """(rows-aligned) total, distinct, max-count, dup-occurrence
        arrays from exploded (doc_index, token_code) pairs."""
        total = np.bincount(doc, minlength=n_rows).astype(np.int64)
        if len(doc) == 0:
            z = np.zeros(n_rows, dtype=np.int64)
            return total, z, z.copy(), z.copy()
        vocab = np.int64(codes.max()) + 1
        key = doc.astype(np.int64) * vocab + codes
        uk, counts = np.unique(key, return_counts=True)
        udoc = (uk // vocab).astype(np.int64)
        distinct = np.bincount(udoc, minlength=n_rows).astype(np.int64)
        top = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(top, udoc, counts)
        dup = np.bincount(
            udoc, weights=np.where(counts > 1, counts, 0), minlength=n_rows
        ).astype(np.int64)
        return total, distinct, top, dup

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(batch)
        s = batch[self.text_col].fillna("").astype(str)
        toks = s.str.lower().str.findall(self.token_re).explode().dropna()
        doc = toks.index.to_numpy(dtype=np.int64)
        vals = toks.to_numpy(dtype=object)
        codes = pd.factorize(vals)[0] if len(vals) else np.array([], dtype=np.int64)
        n_words, n_distinct, top_c, dup_occ = self._per_doc_counts(doc, codes, n_rows)

        # adjacent bigrams: shifted-array concat, masked at doc boundaries
        m = len(vals) - 1
        if m > 0:
            ok = doc[:m] == doc[1:]
            grams = (vals[:m] + " " + vals[1:])[ok]
            gdoc = doc[:m][ok]
            gcodes = pd.factorize(grams)[0] if len(grams) else np.array([], dtype=np.int64)
            n_bigrams, _, top_bc, _ = self._per_doc_counts(gdoc, gcodes, n_rows)
        else:
            n_bigrams = np.zeros(n_rows, dtype=np.int64)
            top_bc = np.zeros(n_rows, dtype=np.int64)

        def frac(num, den):
            return np.divide(
                num.astype(np.float64), den.astype(np.float64),
                out=np.full(n_rows, np.nan), where=den > 0,
            )

        batch["n_words"] = n_words
        batch["distinct_word_frac"] = frac(n_distinct, n_words)
        batch["top_word_frac"] = frac(top_c, n_words)
        batch["dup_word_frac"] = frac(dup_occ, n_words)
        batch["top_bigram_frac"] = frac(top_bc, n_bigrams)
        # NaN comparisons are False in numpy == SQL COALESCE(cond, FALSE)
        with np.errstate(invalid="ignore"):
            batch["keep"] = (
                (batch["top_word_frac"].to_numpy() <= self.max_top_word_frac)
                & (batch["dup_word_frac"].to_numpy() <= self.max_dup_word_frac)
                & ~(batch["top_bigram_frac"].to_numpy() > self.max_top_bigram_frac)
            )
        return batch


def add_repetition_stats(
    ds: ray.data.Dataset, text_col: str = "text", *, concurrency=8, batch_size=4096, **thresholds
) -> ray.data.Dataset:
    return ds.map_batches(
        RepetitionStats, batch_format="pandas", concurrency=clamp_concurrency(concurrency),
        batch_size=batch_size, fn_constructor_args=(text_col,), fn_constructor_kwargs=thresholds,
    )


def add_text_stats(ds: ray.data.Dataset, text_col: str = "text", *, concurrency=8, batch_size=4096) -> ray.data.Dataset:
    return ds.map_batches(
        TextStats, batch_format="pandas", concurrency=clamp_concurrency(concurrency), batch_size=batch_size,
        fn_constructor_args=(text_col,),
    )


def add_lang_id(ds: ray.data.Dataset, text_col: str = "text", *, concurrency=8, batch_size=4096) -> ray.data.Dataset:
    return ds.map_batches(
        LangId, batch_format="pandas", concurrency=clamp_concurrency(concurrency), batch_size=batch_size,
        fn_constructor_args=(text_col,),
    )


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text", *, concurrency=8, batch_size=4096) -> ray.data.Dataset:
    return ds.map_batches(
        Fingerprint, batch_format="pandas", concurrency=clamp_concurrency(concurrency), batch_size=batch_size,
        fn_constructor_args=(text_col,),
    )


def top_terms(
    ds: ray.data.Dataset, text_col: str = "text", *, k: int = 50, num_buckets: int = 32
) -> ray.data.Dataset:
    """Corpus top-k terms by document-token frequency — the vocabulary
    probe of a web-scale text pipeline (stopword discovery, TF-IDF
    document frequency, contamination spot-checks).

    Tokenization is the engine-wide portable convention (ASCII ``[A-Za-z0-9_]+``
    == RE2 ``\\w+`` over lowered text — DuckDB ``regexp_extract_all(lower(text), '\\w+')``).
    Shape: per-block ``value_counts`` partials (a block never emits more
    rows than its distinct terms) → combiner-style
    ``hash_groupby_aggregate`` over the term key → sort/limit on the
    VOCABULARY-sized aggregate, never the corpus. Tie-break: count
    desc, term asc — total order, so top-k is deterministic."""
    import pyarrow as pa

    from .grouped import hash_groupby_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE).explode().dropna()
        counts = toks.value_counts(sort=False)
        return pa.table({"term": pa.array(counts.index.astype(str)),
                         "cnt": pa.array(counts.to_numpy(dtype=np.int64))})

    parts = ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow")
    agg = hash_groupby_aggregate(parts, ["term"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)
    return agg.sort(["cnt", "term"], descending=[True, False]).limit(k)


def document_frequency(
    ds: ray.data.Dataset, text_col: str = "text", *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per-term document frequency (#docs containing the term).

    Per-block combiner: each doc contributes its UNIQUE terms once, the
    block pre-counts them, and only vocabulary-sized partials enter the
    one term-hash exchange."""
    import pyarrow as pa

    from .grouped import hash_groupby_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        uniq = toks.map(lambda ts: list(set(ts))).explode().dropna()
        counts = uniq.value_counts(sort=False)
        return pa.table({"term": pa.array(counts.index.astype(str)),
                         "df": pa.array(counts.to_numpy(dtype=np.int64))})

    parts = ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow")
    return hash_groupby_aggregate(parts, ["term"], {"df": ("df", "sum")}, num_buckets=num_buckets)


def tfidf_score(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-document TF-IDF mass: ``Σ_terms tf(t, d) · ln(N / df(t))`` —
    the standard lexical-salience score (near 0 for stopword-only or
    boilerplate docs, high for token-rich distinctive ones), a common
    quality-filter feature for web-corpus curation.

    Two streaming passes, one vocabulary-sized exchange: (1)
    ``document_frequency`` (combiner → term-hash aggregate); (2)
    re-tokenize and score each doc against the BROADCAST idf table —
    token rows never shuffle (a doc is one row, its tf is block-local).
    Assumes the vocabulary fits the object store (~10^8 terms ≈ GBs);
    beyond that, bucket both sides by term hash instead."""
    import ray as _ray

    import pyarrow as pa

    df_tbl = document_frequency(ds, text_col, num_buckets=num_buckets).to_pandas()
    n_docs = ds.count()
    idf = pd.Series(
        np.log(float(n_docs) / df_tbl["df"].to_numpy(dtype=np.float64)).astype(np.float64),
        index=df_tbl["term"],
    )
    ref = _ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        idf_s: pd.Series = _ray.get(ref)
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        flat = toks.explode().dropna()
        from .grouped import probe_f64
        w = probe_f64(flat.to_numpy(), idf_s)
        sums = np.zeros(len(s), dtype=np.float64)
        np.add.at(sums, flat.index.to_numpy(dtype=np.int64), np.nan_to_num(w))
        out = batch.select([id_col]).to_pandas()
        out["tfidf_sum"] = sums
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.select_columns([id_col, text_col]).map_batches(score, batch_format="pyarrow")


def json_extract_scalar(
    ds: ray.data.Dataset,
    json_col: str,
    key: str,
    *,
    out_col: str | None = None,
    out_type: str = "string",
) -> ray.data.Dataset:
    """Extract a TOP-LEVEL scalar field from a JSON string column —
    the metadata-unpacking step of every event/web-corpus pipeline
    (``props -> {"k": 42}``).

    Vectorized fast path: one compiled regex over the whole column via
    ``pandas.str.extract`` (C-speed, no per-row json.loads). Honest
    scope: top-level scalar keys only — strings, numbers, booleans,
    null; nested objects/arrays and keys containing escaped quotes
    need a real parser and raise ValueError here rather than silently
    mis-extracting. Matches SQL ``json_extract_string(col, '$.key')``
    for that scope. Missing key / null JSON → null.

    ``out_type``: "string" | "int64" | "float64" (numeric casts parse
    the extracted token; non-numeric tokens become null, like SQL
    TRY_CAST).
    """
    import re as _re

    import pyarrow as pa

    if _re.search(r'[\\"\[\]{}.$]', key):
        raise ValueError(
            f"json_extract_scalar: key {key!r} needs a real JSON parser "
            "(nested paths / special characters are out of scope)"
        )
    if out_type not in ("string", "int64", "float64"):
        raise ValueError(f"json_extract_scalar: unsupported out_type '{out_type}'")
    out_col = out_col or key
    # value token: quoted string (no escapes) or bare literal up to , or }
    pat = _re.compile(r'"' + _re.escape(key) + r'"\s*:\s*(?:"([^"\\]*)"|([^,}\s]+))')

    def extract(batch: pa.Table) -> pa.Table:
        s = batch.column(json_col).to_pandas().astype("string")
        m = s.str.extract(pat, expand=True)
        val = m[0].fillna(m[1])  # quoted group else bare group
        val = val.where(val != "null")  # JSON null -> SQL NULL
        if out_type == "string":
            arr = pa.array(val, type=pa.string())
        elif out_type == "int64":
            num = pd.to_numeric(val, errors="coerce")
            arr = pa.array(num.astype("Int64"), type=pa.int64())
        else:
            arr = pa.array(pd.to_numeric(val, errors="coerce"), type=pa.float64())
        return batch.append_column(out_col, arr)

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def top_ngrams(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    n: int = 2,
    k: int = 50,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Corpus top-k token n-grams (same portable ASCII-word-on-lowered
    tokenization as ``top_terms``; gram = tokens joined by one space).
    The phrase-level vocabulary probe — boilerplate detection, common
    collocations, contamination fingerprints.

    Vectorized n-gram construction: tokens are exploded ONCE with
    their source-row index, then the n-gram of position i is the
    string-concat of n shifted token arrays, masked where the window
    crosses a document boundary — no per-document Python loop. Then
    the standard value_counts combiner → term-hash exchange →
    vocabulary-sized sort/limit."""
    import pyarrow as pa

    from .grouped import hash_groupby_aggregate

    if n < 2:
        raise ValueError("top_ngrams: n must be >= 2 (use top_terms for unigrams)")

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE).explode().dropna()
        vals = toks.to_numpy(dtype=object)
        doc = toks.index.to_numpy()
        m = len(vals) - (n - 1)
        if m <= 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        grams = vals[:m]
        ok = doc[:m] == doc[n - 1:]
        for j in range(1, n):
            grams = grams + " " + vals[j:m + j]
        counts = pd.Series(grams[ok]).value_counts(sort=False)
        return pa.table({"term": pa.array(counts.index.astype(str)),
                         "cnt": pa.array(counts.to_numpy(dtype=np.int64))})

    parts = ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow")
    agg = hash_groupby_aggregate(parts, ["term"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)
    return agg.sort(["cnt", "term"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# Patterns valid (and identical in semantics) in both Python re and RE2
# (DuckDB): character classes + bounded repeats + \b only — no
# lookaround, no backreferences — so a SQL engine replays the exact
# counts and replacements. Applied SEQUENTIALLY in this order; each
# pattern counts and redacts over the output of the previous one.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


class PIIRedactor:
    """Actor-pool stage: per-document PII match counts (``n_email,
    n_phone, n_ipv4``) and a fully redacted ``text_redacted`` column.
    Patterns compile ONCE per actor; every operation is a vectorized
    pandas ``.str`` kernel over the batch (C-speed regex loop, no
    per-document Python). Sequential count-then-replace per pattern
    makes the output a pure function of the text, independent of batch
    or block boundaries."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.compiled = [(name, re.compile(pat), tok) for name, pat, tok in PII_PATTERNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        out = batch.copy()
        for name, pat, tok in self.compiled:
            out[f"n_{name}"] = s.str.count(pat).astype(np.int64)
            s = s.str.replace(pat, tok, regex=True)
        out["text_redacted"] = s
        return out


def add_pii_redaction(
    ds: ray.data.Dataset, text_col: str = "text", *, concurrency=8, batch_size=4096
) -> ray.data.Dataset:
    from .grouped import clamp_concurrency

    return ds.map_batches(
        PIIRedactor, batch_format="pandas", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency), fn_constructor_args=(text_col,),
    )


# ---------------------------------------------------------------------------
# corpus n-gram language-model quality scoring (KenLM-style signal)
# ---------------------------------------------------------------------------


def _explode_bigrams(b: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """(doc_id, w1, bigram) rows from adjacent token pairs — shifted-array
    concat masked at document boundaries, no per-document loop. Tokens
    are the portable ASCII word class over lowered text (exact RE2 parity)."""
    toks = b[text_col].fillna("").str.lower().str.findall(ASCII_WORD_RE)
    n = toks.str.len().to_numpy()
    tot = int(n.sum())
    if tot == 0:
        return pd.DataFrame({id_col: b[id_col].to_numpy()[:0],
                             "w1": np.array([], dtype=object),
                             "gram": np.array([], dtype=object)})
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    doc_idx = np.repeat(np.arange(len(b)), n)
    ok = doc_idx[:-1] == doc_idx[1:]          # adjacent pair within one doc
    w1 = flat[:-1][ok]
    return pd.DataFrame({
        id_col: b[id_col].to_numpy()[doc_idx[:-1][ok]],
        "w1": w1,
        "gram": w1 + " " + flat[1:][ok],
    })


def ngram_lm_scores(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    num_buckets: int = 32,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Per-document bigram language-model score over the corpus's OWN
    statistics (the classic pretraining quality signal: gibberish and
    boilerplate score low against the corpus LM):
    ``lm_score = avg over positions of log2 P(w_i | w_{i-1})`` with
    add-k smoothing ``P = (c(w1 w2) + k) / (c(w1) + k*V)``.

    Fully distributed — the vocabulary is NEVER materialized on the
    driver (only the scalar ``V``): bigram/unigram counts reduce via
    the combiner hash exchange; scoring joins the position rows to both
    count tables through the bucketed equi-join; the per-doc average is
    one more combiner exchange. Documents with < 2 tokens emit no rows
    (no bigram positions), matching the SQL oracle's join semantics.
    """
    from .grouped import hash_groupby_aggregate
    from .join import equi_join

    def _unigrams(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].fillna("").str.lower().str.findall(ASCII_WORD_RE)
        tot = int(toks.str.len().sum())
        flat = (np.concatenate([np.asarray(t, dtype=object) for t in toks])
                if tot else np.array([], dtype=object))
        counts = pd.Series(flat).value_counts(sort=False) if tot else pd.Series([], dtype=np.int64)
        return pd.DataFrame({"w1": counts.index.astype(object), "nu": counts.to_numpy(dtype=np.int64)})

    def _bigram_partials(b: pd.DataFrame) -> pd.DataFrame:
        big = _explode_bigrams(b, text_col, id_col)
        counts = big["gram"].value_counts(sort=False)
        return pd.DataFrame({"gram": counts.index.astype(object), "nb": counts.to_numpy(dtype=np.int64)})

    narrow = ds.select_columns([id_col, text_col])
    cu = hash_groupby_aggregate(
        narrow.map_batches(_unigrams, batch_format="pandas"),
        ["w1"], {"nu": ("nu", "sum")}, num_buckets=num_buckets,
    )
    cb = hash_groupby_aggregate(
        narrow.map_batches(_bigram_partials, batch_format="pandas"),
        ["gram"], {"nb": ("nb", "sum")}, num_buckets=num_buckets,
    )
    vocab = cu.count()  # the only driver-side value: one scalar

    positions = narrow.map_batches(
        lambda b: _explode_bigrams(b, text_col, id_col), batch_format="pandas"
    )
    joined = equi_join(
        equi_join(positions, cb, "gram", how="left", broadcast=False, num_buckets=num_buckets),
        cu, "w1", how="left", broadcast=False, num_buckets=num_buckets,
    )

    def _logp(b: pd.DataFrame) -> pd.DataFrame:
        nb = b["nb"].fillna(0).to_numpy(dtype=np.float64)
        nu = b["nu"].fillna(0).to_numpy(dtype=np.float64)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "lp": np.log2((nb + add_k) / (nu + add_k * vocab)),
        })

    per_doc = hash_groupby_aggregate(
        joined.map_batches(_logp, batch_format="pandas"),
        [id_col], {"n_bigrams": (None, "count"), "lm_score": ("lp", "mean")},
        num_buckets=num_buckets,
    )

    def _round(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.set_column(t.schema.get_field_index("lm_score"), "lm_score",
                            pc.round(t.column("lm_score"), ndigits=round_to))

    return per_doc.map_batches(_round, batch_format="pyarrow", zero_copy_batch=True)


def normalize_text(
    ds: ray.data.Dataset, text_col: str = "text", *, out_col: str | None = None
) -> ray.data.Dataset:
    """Canonical text normalization for curation: lowercase, collapse
    every run of ASCII whitespace to one space, strip the boundary
    space. Pure Arrow kernels (utf8_lower + replace_substring_regex +
    utf8_trim) — zero-copy batches, zero shuffle, no Python per row.

    The whitespace class is written out explicitly (``[ \\t\\r\\n\\f\\v]``)
    rather than ``\\s`` so the engine (Python re semantics in Arrow's
    RE2) and the DuckDB oracle (RE2, ASCII ``\\s``) agree byte-for-byte
    even on non-ASCII whitespace, which stays untouched in both. Null
    text stays null (SQL semantics). Equivalent oracle expression:
    ``trim(regexp_replace(lower(text), '[ \\t\\r\\n\\f\\v]+', ' ', 'g'))``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    dst = out_col or text_col

    def norm(batch: pa.Table) -> pa.Table:
        col = pc.utf8_lower(batch.column(text_col))
        col = pc.replace_substring_regex(col, pattern="[ \t\r\n\f\v]+", replacement=" ")
        col = pc.utf8_trim(col, characters=" ")
        if dst in batch.column_names:
            return batch.set_column(batch.schema.get_field_index(dst), dst, col)
        return batch.append_column(dst, col)

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def source_quality_filter(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    metric: str = "distinct_word_frac",
    min_mean: float = 0.5,
    round_to: int = 6,
    concurrency=8,
) -> ray.data.Dataset:
    """Source/domain-level quality gate (the C4 move: drop whole
    domains whose documents are on average boilerplate, not just the
    individual bad documents): score every document with the Gopher
    repetition signals, roll the chosen ``metric`` up to a per-source
    mean, and keep only documents from sources whose mean clears
    ``min_mean``.

    Distributed shape: the doc scoring pass is shuffle-free (actor
    pool); ONE combiner mean exchange reduces the corpus to one row per
    source; the verdict set (domain-vocabulary-sized) broadcasts and
    the final keep is a zero-shuffle filter. The mean is quantized to
    ``round_to`` decimals on BOTH the engine and oracle side before the
    threshold comparison, so summation-order ulp cannot flip a verdict.
    """
    from .grouped import hash_groupby_aggregate
    import ray

    scored = add_repetition_stats(
        ds.select_columns([group_col, text_col]), text_col, concurrency=concurrency
    )
    per_source = hash_groupby_aggregate(
        scored.select_columns([group_col, metric]), [group_col],
        {"__m__": (metric, "mean")}, num_buckets=4,
    ).to_pandas()
    m = np.round(per_source["__m__"].to_numpy(dtype=np.float64), round_to)
    good = set(per_source.loc[m >= min_mean, group_col])
    ref = ray.put(good)

    def keep(batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        g = ray.get(ref)
        mask = pc.is_in(batch.column(group_col),
                        value_set=pa.array(sorted(g), type=batch.schema.field(group_col).type))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 0,
    out_text_col: str = "chunk_text",
) -> ray.data.Dataset:
    """Context-window chunking: split each document into whitespace-token
    chunks of ``chunk_tokens`` with ``overlap`` tokens carried between
    consecutive chunks (stride = chunk_tokens − overlap) — the standard
    long-document preparation for embedding / pre-training pipelines.
    Chunk text is the space-joined token slice (normalized whitespace —
    chunkers re-join tokens), so the output is SQL-replayable via list
    slicing: ``array_to_string(toks[c·stride+1 : least(c·stride+W, n)],
    ' ')``. Empty/null documents emit no chunks.

    Zero shuffle — a pure per-batch flat map; chunk-count arithmetic is
    vectorized across the batch, the only per-item work is the C-speed
    ``' '.join`` per OUTPUT chunk (never per token)."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    import pyarrow as pa

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.findall(ASCII_NONSPACE_RE)
        n = toks.str.len().to_numpy(dtype=np.int64)
        n_chunks = np.where(
            n == 0, 0,
            np.where(n <= chunk_tokens, 1,
                     1 + np.ceil((n - chunk_tokens) / float(stride)).astype(np.int64)),
        ).astype(np.int64)
        total = int(n_chunks.sum())
        doc_pos = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
        offs = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(offs, n_chunks)
        tok_lists = toks.to_numpy(dtype=object)
        ids = batch[id_col].to_numpy()
        texts = [
            " ".join(tok_lists[d][c * stride: c * stride + chunk_tokens])
            for d, c in zip(doc_pos, chunk_idx)
        ]
        return pd.DataFrame({
            id_col: ids[doc_pos],
            "chunk_idx": chunk_idx,
            out_text_col: pd.array(texts, dtype="string"),
        })

    return ds.map_batches(explode, batch_format="pandas")


def top_keyword(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_buckets: int = 32,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Per-document keyword extraction: the term with the highest
    ``tf·ln(N/df)`` (ties: highest score then lexicographically smallest
    term — exact float equality is deterministic because both engines
    multiply the same two doubles). Same broadcast-idf shape as
    ``tfidf_score``: token rows never shuffle. Tokenless docs emit a
    null keyword."""
    import ray as _ray
    import pyarrow as pa

    df_tbl = document_frequency(ds, text_col, num_buckets=num_buckets).to_pandas()
    n_docs = ds.count()
    idf = pd.Series(
        np.log(float(n_docs) / df_tbl["df"].to_numpy(dtype=np.float64)),
        index=df_tbl["term"],
    )
    ref = _ray.put(idf)

    def kw(batch: pa.Table) -> pa.Table:
        idf_s: pd.Series = _ray.get(ref)
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        flat = toks.explode().dropna()
        out = batch.select([id_col]).to_pandas()
        if len(flat):
            tf = (
                pd.DataFrame({"row": flat.index.to_numpy(), "term": flat.to_numpy()})
                .groupby(["row", "term"], sort=False).size().reset_index(name="tf")
            )
            from .grouped import probe_f64
            tf["score"] = tf["tf"].to_numpy(dtype=np.float64) * probe_f64(tf["term"].to_numpy(), idf_s)
            best = tf.sort_values(["row", "score", "term"],
                                  ascending=[True, False, True],
                                  kind="mergesort").groupby("row", sort=False).head(1)
            out["keyword"] = pd.Series(best["term"].to_numpy(), index=best["row"].to_numpy()) \
                .reindex(range(len(out))).astype("string")
            sc = pd.Series(best["score"].to_numpy(), index=best["row"].to_numpy()) \
                .reindex(range(len(out))).to_numpy(dtype=np.float64)
        else:
            out["keyword"] = pd.array([pd.NA] * len(out), dtype="string")
            sc = np.full(len(out), np.nan)
        if round_to is not None:
            scale = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                sc = np.sign(sc) * np.floor(np.abs(sc) * scale + 0.5) / scale
        out["keyword_score"] = sc
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.select_columns([id_col, text_col]).map_batches(kw, batch_format="pyarrow")


def bm25_score(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    query_terms: "list[str]",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: "int | None" = None,
) -> ray.data.Dataset:
    """Per-document Okapi BM25 relevance against a fixed query — the
    standard lexical retrieval scorer (quality-signal / retrieval-eval
    step of a training-data pipeline; reference has no retrieval ops,
    this extends its text surface like tfidf_score does).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Shape: TWO streaming passes, ZERO shuffles. Pass 1 reduces each
    block to ONE row of partials (row count, token count, per-query-term
    doc frequency — |Q| is a handful, so the partial table is
    O(blocks × Q) scalars merged on the driver). Pass 2 scores each doc
    against the tiny broadcast (idf, avgdl) — token rows never leave
    their block. Determinism: the per-doc sum runs in fixed
    ``query_terms`` order, every factor is float64, so the score is
    bit-stable at any parallelism.

    Tokenization is the engine-wide portable convention (ASCII ``[A-Za-z0-9_]+``
    == RE2 ``\\w+`` over lowered text), so the DuckDB oracle replays it exactly. Docs with
    no query terms score 0.0. avgdl counts ALL docs (tokenless ones
    contribute dl=0); an empty corpus raises.
    """
    import pyarrow as pa

    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    if not terms:
        raise ValueError("bm25_score: query_terms must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        flat = toks.explode().dropna()
        dfs = []
        for t in terms:
            hit = flat[flat == t]
            dfs.append(int(hit.index.nunique()))
        return pa.table({
            "n": pa.array([len(s)], type=pa.int64()),
            "dl_sum": pa.array([int(flat.notna().sum())], type=pa.int64()),
            **{f"df_{i}": pa.array([d], type=pa.int64()) for i, d in enumerate(dfs)},
        })

    parts = ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    if n_docs == 0:
        raise ValueError("bm25_score: empty corpus")
    avgdl = float(parts["dl_sum"].sum()) / float(n_docs)
    idf = np.array(
        [np.log1p((n_docs - df + 0.5) / (df + 0.5))
         for df in (int(parts[f"df_{i}"].sum()) for i in range(len(terms)))],
        dtype=np.float64,
    )

    k1 = float(k1)
    b = float(b)

    def score(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        flat = toks.explode().dropna()
        dl = np.zeros(len(s), dtype=np.float64)
        if len(flat):
            np.add.at(dl, flat.index.to_numpy(dtype=np.int64), 1.0)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        sc = np.zeros(len(s), dtype=np.float64)
        for i, t in enumerate(terms):  # fixed order => deterministic sum
            tf = np.zeros(len(s), dtype=np.float64)
            hit = flat[flat == t]
            if len(hit):
                np.add.at(tf, hit.index.to_numpy(dtype=np.int64), 1.0)
            contrib = idf[i] * tf * (k1 + 1.0) / (tf + denom_norm)
            sc += np.where(tf > 0.0, contrib, 0.0)
        if round_to is not None:
            scale = 10.0 ** round_to
            sc = np.sign(sc) * np.floor(np.abs(sc) * scale + 0.5) / scale
        out = batch.select([id_col]).to_pandas()
        out["bm25"] = sc
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.select_columns([id_col, text_col]).map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# heavy hitters without a vocabulary exchange (count-min sketch + recount)
# ---------------------------------------------------------------------------

_CMS_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    x = x + _CMS_MIX
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _cms_rows(terms: "pd.Index", depth: int, width: int) -> np.ndarray:
    """(depth, n_terms) bucket indices: one base hash per term, one
    splitmix64 remix per sketch row — fully vectorized."""
    base = pd.util.hash_array(terms.to_numpy(dtype=object))
    return np.stack([
        _splitmix64(base ^ np.uint64((0xA076_1D64_78BD_642F * (i + 1))
                                     & 0xFFFF_FFFF_FFFF_FFFF))
        % np.uint64(width)
        for i in range(depth)
    ]).astype(np.int64)


def heavy_hitter_terms(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    threshold: int,
    depth: int = 4,
    width: int = 1 << 14,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """EXACT heavy hitters (every term with corpus count ≥ ``threshold``)
    WITHOUT ever exchanging the vocabulary long tail — the two-pass
    count-min-sketch plan: pass 1 reduces each block to a fixed
    ``depth × width`` int64 sketch merged associatively by Ray's
    aggregate (bytes through the reduce are ``blocks × sketch``,
    independent of vocabulary size); pass 2 broadcasts the merged
    sketch and re-counts ONLY terms whose CMS estimate clears the
    threshold. CMS never underestimates, so no true heavy hitter is
    missed, and the exact recount discards the sketch's false
    positives — the output is bit-identical to the full GROUP BY
    (SQL ``HAVING COUNT(*) >= t``), at a fraction of the exchange.

    Tokenization is the engine-wide portable convention (ASCII ``[A-Za-z0-9_]+``
    == RE2 ``\\w+`` over lowered text). Output: ``(term, n)``, exact int64 counts.
    """
    import ray as _ray
    from ray.data.aggregate import AggregateFnV2

    from .grouped import hash_groupby_aggregate

    def block_counts(batch: pa.Table) -> "pd.Series":
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE).explode().dropna()
        return toks.value_counts(sort=False)

    class CmsAgg(AggregateFnV2):
        def __init__(self):
            super().__init__("cms", lambda: np.zeros((depth, width), dtype=np.int64),
                             on=None, ignore_nulls=False)

        def aggregate_block(self, block):
            t = pa.Table.from_pandas(block) if isinstance(block, pd.DataFrame) else block
            counts = block_counts(t)
            cms = np.zeros((depth, width), dtype=np.int64)
            if len(counts):
                rows = _cms_rows(counts.index, depth, width)
                c = counts.to_numpy(dtype=np.int64)
                for i in range(depth):
                    np.add.at(cms[i], rows[i], c)
            return cms

        def combine(self, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return a + b

    cms = ds.select_columns([text_col]).aggregate(CmsAgg())["cms"]
    cref = _ray.put(cms)

    def candidates(batch: pa.Table) -> pa.Table:
        counts = block_counts(batch)
        if not len(counts):
            return pa.table({"term": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        g = _ray.get(cref)
        rows = _cms_rows(counts.index, depth, width)
        est = np.min(np.stack([g[i, rows[i]] for i in range(depth)]), axis=0)
        keep = est >= threshold
        return pa.table({"term": pa.array(counts.index.to_numpy()[keep], type=pa.string()),
                         "cnt": pa.array(counts.to_numpy(dtype=np.int64)[keep])})

    parts = ds.select_columns([text_col]).map_batches(candidates, batch_format="pyarrow")
    agg = hash_groupby_aggregate(parts, ["term"], {"n": ("cnt", "sum")},
                                 num_buckets=num_buckets)
    return agg.filter(expr=f"n >= {int(threshold)}")


def pmi_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    min_pair_count: int = 5,
    k: int = 30,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Collocation mining: top-``k`` term pairs by document-level
    pointwise mutual information ``ln(N·n_ab / (n_a·n_b))`` (terms that
    co-occur in documents far more than independence predicts — the
    phrase/topic probe of corpus analysis). Pair counts are
    DOCUMENT-level (each doc contributes its distinct unordered pairs
    once); ties order by (pmi desc, ta, tb) on the 6dp-quantized score.

    Shape: each block reduces to its per-pair and per-term document
    counts (a doc with d distinct terms costs d² pair partials — bound
    d upstream for pathological docs), ONE pair-hash exchange merges
    pair partials, the vocabulary-sized term-frequency table broadcasts
    into a zero-shuffle PMI map, and the final sort/limit runs on the
    pair AGGREGATE, never the corpus. The log argument is an exact
    ratio of int64 products (< 2^53 territory), so both engines take
    ``ln`` of the identical double."""
    import ray as _ray

    from .grouped import hash_groupby_aggregate

    n_docs = ds.count()

    def doc_terms(batch: pa.Table) -> pd.DataFrame:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        long = toks.explode().dropna()
        return pd.DataFrame({"__d__": long.index.to_numpy(), "term": long.to_numpy()}) \
            .drop_duplicates()

    def pair_partial(batch: pa.Table) -> pa.Table:
        d = doc_terms(batch)
        m = d.merge(d, on="__d__")
        m = m[m["term_x"] < m["term_y"]]
        c = m.groupby(["term_x", "term_y"], sort=False).size().reset_index(name="n")
        return pa.table({"ta": pa.array(c["term_x"], type=pa.string()),
                         "tb": pa.array(c["term_y"], type=pa.string()),
                         "n": pa.array(c["n"].to_numpy(np.int64))})

    def df_partial(batch: pa.Table) -> pa.Table:
        d = doc_terms(batch)
        c = d.groupby("term", sort=False).size().reset_index(name="n")
        return pa.table({"term": pa.array(c["term"], type=pa.string()),
                         "n": pa.array(c["n"].to_numpy(np.int64))})

    narrow = ds.select_columns([text_col])
    pairs = hash_groupby_aggregate(
        narrow.map_batches(pair_partial, batch_format="pyarrow"),
        ["ta", "tb"], {"nab": ("n", "sum")}, num_buckets=num_buckets)
    dfreq = hash_groupby_aggregate(
        narrow.map_batches(df_partial, batch_format="pyarrow"),
        ["term"], {"n": ("n", "sum")}, num_buckets=8).to_pandas()
    ref = _ray.put(dict(zip(dfreq["term"], dfreq["n"].astype(np.int64))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(ref)
        b = b[b["nab"] >= min_pair_count]
        from .grouped import probe_f64
        ts = pd.Series(t)
        na = probe_f64(b["ta"].to_numpy(), ts)
        nb = probe_f64(b["tb"].to_numpy(), ts)
        arg = b["nab"].to_numpy(np.float64) * float(n_docs) / (na * nb)
        pmi = np.log(arg)
        pmi = np.sign(pmi) * np.floor(np.abs(pmi) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"ta": b["ta"], "tb": b["tb"],
                             "nab": b["nab"].astype(np.int64), "pmi": pmi})

    scored = pairs.map_batches(score, batch_format="pandas")
    return scored.sort(["pmi", "ta", "tb"], descending=[True, False, False]).limit(k)


def source_token_share(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    group_col: str = "source",
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Training-mix composition report: per ``group_col`` total token
    count, corpus share, and cumulative share in descending-token order
    (which sources fill the training budget, and how fast). Token
    counts reduce per block (combiner), one sources-sized exchange
    merges, and the window math runs on the SOURCES-sized aggregate —
    shares are exact ratios of int64 sums, so both engines hold
    identical doubles (6dp only for the division convention)."""
    from .grouped import hash_groupby_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        n = s.str.lower().str.count(ASCII_WORD_RE).to_numpy(np.int64)
        g = batch.column(group_col).to_pandas()
        c = pd.DataFrame({group_col: g, "__n__": n}) \
            .groupby(group_col, sort=False, dropna=False).sum().reset_index()
        return pa.Table.from_pandas(c, preserve_index=False)

    agg = hash_groupby_aggregate(
        ds.select_columns([group_col, text_col]).map_batches(partial, batch_format="pyarrow"),
        [group_col], {"tokens": ("__n__", "sum")}, num_buckets=num_buckets,
    ).to_pandas()  # sources-sized RESULT by design
    agg = agg.sort_values(["tokens", group_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    tot = float(agg["tokens"].sum())
    cum = agg["tokens"].cumsum().to_numpy(np.float64)
    out = pd.DataFrame({
        group_col: agg[group_col],
        "tokens": agg["tokens"].astype(np.int64),
        "share": np.floor(agg["tokens"].to_numpy(np.float64) / tot * 1e6 + 0.5) / 1e6,
        "cum_share": np.floor(cum / tot * 1e6 + 0.5) / 1e6,
    })
    return ray.data.from_pandas(out)


class Readability:
    """Flesch-style reading-ease score per document — the prose-
    complexity gate of a curation pipeline (too-low = dense legalese /
    OCR noise, too-high = fragmentary listicles). Deterministic,
    SQL-replayable surrogates: sentences = maximal ``[.!?]+`` runs,
    words = the engine-wide portable ASCII word class, syllables = vowel
    groups ``[aeiouy]+`` over the lowered text. Adds ``n_sentences,
    n_words, n_syllables, flesch`` (6dp; null when a count is zero).
    Zero shuffle — one vectorized pass; regexes compile once per actor.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("").astype(str).str.lower()
        words = s.str.count(ASCII_WORD_RE).to_numpy(np.int64)
        sents = s.str.count(r"[.!?]+").to_numpy(np.int64)
        syll = s.str.count(r"[aeiouy]+").to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            f = (206.835 - 1.015 * (words / sents) - 84.6 * (syll / words))
        f = np.where((words > 0) & (sents > 0), f, np.nan)
        sc = 1e6
        with np.errstate(invalid="ignore"):
            f = np.sign(f) * np.floor(np.abs(f) * sc + 0.5) / sc
        batch["n_sentences"] = sents
        batch["n_words"] = words
        batch["n_syllables"] = syll
        batch["flesch"] = f
        return batch


def inverted_postings(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_df: int = 10,
    cap: int = 20,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Inverted-index postings: for every term with document frequency
    ``>= min_df``, the first ``cap`` containing doc ids in ascending
    order — the retrieval-index build step (BM25 serving, contamination
    lookups, "which docs say X" debugging) expressed as one
    term-bucketed exchange.

    Tokenization is the engine-wide portable convention (ASCII
    ``[A-Za-z0-9_]+`` == RE2 ``\\w+`` over lowered text). Shape: each
    block explodes docs to DISTINCT (term, doc_id) pairs (a doc
    contributes a term once — doc ids are row-unique so block-local
    dedup is global dedup), ONE term-hash exchange moves only those
    pairs (ids + terms, never text), and each term-complete bucket
    closes df + the capped ascending posting head with vectorized
    segment scans. ``cap`` bounds the output (and the driver-visible
    result) the way real index builders bound posting-list heads;
    the exchange itself is the honest cost — an inverted index IS a
    shuffle of the token surface.

    Output rows: ``(term, df, pos, doc_id)`` — postings pre-flattened
    with ``pos`` = 1-based rank of ``doc_id`` within the term's
    ascending posting list (SQL: ``row_number() OVER (PARTITION BY term
    ORDER BY doc_id)``)."""
    from .grouped import grouped_ordered_map

    def pairs(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").astype(str)
        toks = s.str.lower().str.findall(ASCII_WORD_RE)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        uniq = toks.map(lambda ts: sorted(set(ts)))
        counts = uniq.map(len).to_numpy(dtype=np.int64)
        terms = np.concatenate([np.asarray(t, dtype=object) for t in uniq if t]) \
            if counts.sum() else np.array([], dtype=object)
        return pa.table({"term": pa.array(terms.astype(str) if len(terms) else [], type=pa.string()),
                         id_col: pa.array(np.repeat(ids, counts))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # sorted by (term, doc_id); terms are bucket-complete
        t = g["term"].to_numpy(dtype=object)
        n = len(g)
        if n == 0:
            return pd.DataFrame({"term": pd.array([], dtype="string"),
                                 "df": np.array([], dtype=np.int64),
                                 "pos": np.array([], dtype=np.int64),
                                 id_col: np.array([], dtype=np.int64)})
        bound = np.flatnonzero(t[1:] != t[:-1]) + 1
        starts = np.concatenate(([0], bound))
        sizes = np.diff(np.concatenate((starts, [n])))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes) + 1
        df_rep = np.repeat(sizes, sizes)
        keep = (df_rep >= min_df) & (pos <= cap)
        return pd.DataFrame({
            "term": pd.array(t[keep], dtype="string"),
            "df": df_rep[keep].astype(np.int64),
            "pos": pos[keep],
            id_col: g[id_col].to_numpy()[keep],
        })

    exploded = ds.select_columns([id_col, text_col]).map_batches(pairs, batch_format="pyarrow")
    return grouped_ordered_map(exploded, "term", [id_col], per_bucket, num_buckets=num_buckets)
