"""Benchmark decontamination — remove training documents that overlap an
evaluation set (the standard pre-training hygiene step; see GPT-3 App. C /
Llama-style 13-gram filtering for the published construction).

Two variants, one scale story:

* :class:`SnippetScanner` — exact substring containment against a small
  benchmark snippet list. The snippets are the SMALL side: broadcast once
  (``ray.put``), materialized into per-worker state once per actor
  (``worker_cached``), and every batch is scanned with pandas'
  vectorized ``str.contains(..., regex=False)`` per snippet. Cost per
  batch is O(snippets × batch_bytes) — fine for benchmark-sized snippet
  sets (10³–10⁵); for snippet sets beyond that, use the n-gram path
  below, which is O(batch_tokens) regardless of benchmark size.
* :func:`ngram_decontaminate` — hashed n-gram overlap (the production
  formulation): hash every word n-gram of the benchmark once into a
  sorted uint64 array, broadcast it, and count per-document matches with
  one vectorized ``searchsorted`` per batch. Reuses the engine's flat
  tokenizer/shingle kernels (``text/hashing.py``) so n-gram boundaries
  are bit-identical with the dedup family.

No analog exists in the reference (gridfia is a raster engine); this is
a brief-driven LLM-training-data operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from gridfia_ray.text.hashing import shingle_hashes64, token_hashes64, unique_per_doc


class SnippetScanner:
    """Actor-pool stage: count, per document, how many DISTINCT benchmark
    snippets occur verbatim in the text. Snippet list is resolved from
    the object store and de-duplicated ONCE per worker in ``__init__``;
    ``__call__`` does one vectorized substring scan per snippet."""

    def __init__(self, snippets_ref, id_col: str = "doc_id", text_col: str = "text",
                 attach_all: bool = False):
        snippets = ray.get(snippets_ref) if not isinstance(snippets_ref, list) else snippets_ref
        # distinct, deterministic order; empty snippets would match
        # everything vacuously — reject them loudly
        uniq = sorted(set(snippets))
        if any(not s for s in uniq):
            raise ValueError("empty benchmark snippet — would match every document")
        self.snippets = uniq
        self.id_col = id_col
        self.text_col = text_col
        self.attach_all = attach_all  # keep every input column (corpus-build mode)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        hits = np.zeros(len(batch), dtype=np.int64)
        for s in self.snippets:
            hits += t.str.contains(s, regex=False).to_numpy(dtype=np.int64)
        out = batch.copy() if self.attach_all else batch[[self.id_col]].copy()
        out["n_hits"] = hits
        return out


def snippet_hits(
    docs: rd.Dataset,
    snippets: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = False,
    attach_all: bool = False,
) -> rd.Dataset:
    """Per-document distinct-snippet containment counts.

    ``keep_clean=False`` returns only contaminated docs (n_hits ≥ 1) —
    the review list; ``keep_clean=True`` returns every doc with its
    count — the filter input. ``attach_all=True`` carries every input
    column through (corpus-build mode: filter and keep the documents).
    Snippets ship to workers once via ``ray.put``; documents stream."""
    from gridfia_ray.stages.worker_state import worker_cached

    ref = ray.put(list(snippets))
    scored = docs.map_batches(
        worker_cached(SnippetScanner, snippets_ref=ref, id_col=id_col,
                      text_col=text_col, attach_all=attach_all),
        batch_format="pandas",
    )
    if keep_clean:
        return scored
    return scored.map_batches(lambda b: b[b["n_hits"] > 0], batch_format="pandas")


def bench_ngram_hashes(texts, n: int = 8, lower: bool = True) -> np.ndarray:
    """Sorted distinct uint64 hashes of every word n-gram in the
    benchmark texts — the broadcast side of :func:`ngram_decontaminate`.
    Benchmark sets are small by definition; this runs on the driver (or
    in one task) once per job."""
    th, counts = token_hashes64(list(texts), lower=lower)
    sh, _ = shingle_hashes64(th, counts, k=n)
    return np.unique(sh)


class _NgramMatcher:
    """Per-batch: tokenize → n-gram hashes → distinct per doc → count
    membership in the broadcast benchmark set via searchsorted."""

    def __init__(self, bench_ref, n: int, lower: bool, id_col: str, text_col: str):
        bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        self.bench = np.ascontiguousarray(bench, dtype=np.uint64)
        self.n = n
        self.lower = lower
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").tolist()
        th, counts = token_hashes64(texts, lower=self.lower)
        sh, sh_counts = shingle_hashes64(th, counts, k=self.n)
        sh, sh_counts = unique_per_doc(sh, sh_counts)
        if sh.size and self.bench.size:
            pos = np.searchsorted(self.bench, sh)
            in_range = pos < self.bench.size
            hit = np.zeros(sh.size, dtype=bool)
            hit[in_range] = self.bench[pos[in_range]] == sh[in_range]
            doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), sh_counts)
            n_hits = np.bincount(doc_idx[hit], minlength=len(texts)).astype(np.int64)
        else:
            n_hits = np.zeros(len(texts), dtype=np.int64)
        out = batch[[self.id_col]].copy()
        out["n_hits"] = n_hits
        out["n_ngrams"] = sh_counts.astype(np.int64)
        return out


def ngram_decontaminate(
    docs: rd.Dataset,
    bench_hashes: np.ndarray,
    *,
    n: int = 8,
    lower: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = False,
) -> rd.Dataset:
    """Hashed word-n-gram overlap of every document against a benchmark
    hash set (from :func:`bench_ngram_hashes`). Returns
    (id, n_hits, n_ngrams); ``n_hits`` counts DISTINCT benchmark n-grams
    present in the doc. O(tokens·log bench) per batch, benchmark
    broadcast once — documents stream at any corpus size."""
    from gridfia_ray.stages.worker_state import worker_cached

    # benchmark side is small; always sort+dedup so searchsorted is valid
    bench = np.unique(np.asarray(bench_hashes, dtype=np.uint64))
    ref = ray.put(bench)
    scored = docs.map_batches(
        worker_cached(
            _NgramMatcher, bench_ref=ref, n=n, lower=lower, id_col=id_col, text_col=text_col
        ),
        batch_format="pandas",
    )
    if keep_clean:
        return scored
    return scored.map_batches(lambda b: b[b["n_hits"] > 0], batch_format="pandas")
