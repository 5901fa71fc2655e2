"""LLM document plane: dedup (exact/incremental/near/canonical/
substr/CDC), decontamination, quality/langid, BPE, retrieval
(TF-IDF/BM25/RRF), corpus build, sketch-pinned twins.

Split out of the former monolithic ``gridfia_ray/contract.py`` (round-5
VERDICT #3); see ``gridfia_ray/contract/__init__.py`` for the package
map. Query/oracle semantics are unchanged.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

from gridfia_ray import fixtures
from gridfia_ray.io import read_parquet_clean
from gridfia_ray.kernels.base import KernelContext
from gridfia_ray.kernels.registry import registry
from gridfia_ray.pipelines.common import GridSpec
from gridfia_ray.contract._shared import *  # noqa: F401,F403


def q_doc_dedup_exact(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.dedup.docs import exact_dedup_docs

    out = exact_dedup_docs(_docs(sf_dir)).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)

def q_doc_token_count(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.text.ops import token_count

    out = _docs(sf_dir).map_batches(token_count, batch_format="pandas").to_pandas()
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_corpus_build(sf_dir: str) -> pd.DataFrame:
    """The RESUMABLE sharded corpus build driven end-to-end: the same
    dedup → quality → decontaminate chain as doc_filter_chain, but
    executed shard-by-shard on text-hash buckets with atomic part=K
    parquet + manifest lineage (pipelines/corpus). Shard key = text
    hash, so per-shard exact dedup ≡ global dedup and the part UNION
    must hash-match the one-shot chain's SQL oracle exactly."""
    import shutil
    import tempfile

    import ray.data as rd

    from gridfia_ray.pipelines.corpus import run_corpus_filter_checkpointed

    tmp = tempfile.mkdtemp(prefix="gf_corpus_")
    try:
        run_corpus_filter_checkpointed(
            os.path.join(sf_dir, "documents.parquet"),
            _bench_snippets(sf_dir),
            tmp,
            n_shards=2,
        )
        files = sorted(
            os.path.join(tmp, d, fn)
            for d in os.listdir(tmp)
            if d.startswith("part=")
            for fn in os.listdir(os.path.join(tmp, d))
            if fn.endswith(".parquet")
        )
        out = read_parquet_clean(files, columns=["doc_id"]).to_pandas()
        return (
            pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64)})
            .sort_values("doc_id", ignore_index=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

def q_doc_pack(sf_dir: str) -> pd.DataFrame:
    """LLM sample packing (pipelines/pack.pack_sequences): greedy
    first-fit of whitespace token counts into 256-token sequences,
    8 modulo shards — one bucketed exchange, per-shard integer scan.
    The (seq_id, seq_pos) assignment is a pure function of the input,
    verified against a recursive-CTE replay of the greedy rule."""
    from gridfia_ray.pipelines.pack import pack_sequences
    from gridfia_ray.text.ops import token_count

    toks = _docs(sf_dir).map_batches(token_count, batch_format="pandas")
    out = pack_sequences(toks, budget=256, n_shards=8).to_pandas()
    for c in ["doc_id", "shard", "seq_id", "seq_pos", "n_tokens"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_redact(sf_dir: str) -> pd.DataFrame:
    """PII scrub stage (text/ops.redact_pii) over the planted-PII pin
    corpus: emails, IPv4s and intl phone numbers → typed placeholders.
    The redacted TEXT itself is hash-compared against DuckDB's
    regexp_replace running the identical RE2-compatible patterns in the
    identical order."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.ops import redact_pii

    tune_context()
    docs = rd.read_parquet(oracle_pins.ensure_docpin()["pii_documents"])
    out = docs.map_batches(redact_pii, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_redactions"] = out["n_redactions"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_mix(sf_dir: str) -> pd.DataFrame:
    """Deterministic corpus mixture (pipelines/sampling.mix_by_key):
    per-source keep-rates realized as md5-rank thresholds — the
    pre-training data-mixing step, SQL-reproducible bit-for-bit."""
    from gridfia_ray.pipelines.sampling import mix_by_key

    out = mix_by_key(
        _docs(sf_dir), "source", _MIX_RATES, ["source", "doc_id"],
        default_rate=_MIX_DEFAULT,
    ).to_pandas()
    out = out[["doc_id", "source"]]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_stratified(sf_dir: str) -> pd.DataFrame:
    """Proportional stratified sample (pipelines/sampling.
    stratified_sample): the ⌈n_g/10⌉ smallest-md5-rank docs per source
    — exact integer allocation per stratum (float ceil(0.1·n) flips on
    multiples of 10; both sides use (n+9)//10)."""
    from gridfia_ray.pipelines.sampling import stratified_sample

    out = stratified_sample(
        _docs(sf_dir), "source", 1, 10, ["doc_id"]
    ).to_pandas()
    out = out[["doc_id", "source"]]
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_bpe_tokens(sf_dir: str) -> pd.DataFrame:
    """BPE-style pre-tokenizer count (RE2-compatible pattern shared
    verbatim with the SQL oracle)."""
    from gridfia_ray.text.ops import bpe_token_count

    out = _docs(sf_dir).map_batches(bpe_token_count, batch_format="pandas").to_pandas()
    out["n_bpe_tokens"] = out["n_bpe_tokens"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """CCNet-style quality scoring: add-one bigram LM trained on the
    lang='en' slice, every doc scored as integer micro-nat log-prob
    sums (order-free int64 — bit-exact vs the SQL oracle)."""
    from gridfia_ray.text.lm import perplexity_scores

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return perplexity_scores(docs, ref_filter="en", ref_col="lang")

def q_doc_nb_classifier(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes (text/nb.py): train per-language token
    counts over the labeled corpus, score every ≥1-token document with
    integer micro-nat log-probs, predict argmax (ties → smallest
    class). Bit-exact vs the SQL oracle's identical arithmetic."""
    from gridfia_ray.text.nb import nb_classify

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return nb_classify(docs, label_col="lang")

def q_doc_winnow(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints (text/winnow.py — Schleimer et al. 2003):
    md5 char-8-gram hashes, window-4 rightmost-min selection,
    deduplicated (doc_id, pos, h) rows. Pure map per document —
    bit-exact vs the SQL per-window replay."""
    from gridfia_ray.text.winnow import winnow_fingerprints

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    out = winnow_fingerprints(docs, k=_WINNOW_K, w=_WINNOW_W).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["pos"] = out["pos"].astype(np.int64)
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)

def q_doc_chi2_keywords(sf_dir: str) -> pd.DataFrame:
    """χ² feature selection (text/chi2.py): top-10 tokens per source by
    the 2×2 document-contingency chi-square, exact int64 cells, ONE
    float64 division with the identical expression tree on both sides,
    ranked on the quantized integer. One token-bucketed exchange +
    grouped top-k."""
    from gridfia_ray.text.chi2 import chi2_keywords

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return chi2_keywords(docs, k=10, label_col="source")

def q_doc_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR-style importance weights (text/dsir.py): hashed-unigram
    target/raw log-ratio per document (target = lang 'en'), integer
    micro-nats, 4096 md5-prefix buckets. Model folds to 2×4096 ints,
    broadcasts, scoring is a pure map — bit-exact vs the SQL oracle."""
    from gridfia_ray.text.dsir import dsir_weights

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return dsir_weights(docs, target_filter="en", target_col="lang")

def q_doc_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """TF-IDF retrieval: top-10 documents per query doc by integer
    tf-idf dot product (idf quantized to milli-nats, tf raw counts —
    bit-exact vs the SQL oracle's identical integer arithmetic)."""
    from gridfia_ray.text.tfidf import tfidf_topk

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return tfidf_topk(docs, _TFIDF_QUERY_IDS, k=10)

def q_doc_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 retrieval (Okapi/Lucene scorer): top-10 documents per query
    doc, integer-exact — k1=6/5 and b=3/4 as exact rationals fold the
    length normalization into ONE int64 floor division per (doc, term),
    idf quantized to milli-nats, so scores bit-match the SQL oracle's
    identical integer arithmetic (text/bm25.py)."""
    from gridfia_ray.text.bm25 import bm25_topk

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return bm25_topk(docs, _TFIDF_QUERY_IDS, k=10)

def q_doc_hybrid_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (ann/hybrid.py):
    BM25 top-20 (integer milli-nat scorer) ∥ quantized-MIPS top-20
    (floor(v·2^20+0.5) int64 dot products — zero float ranking
    ambiguity) fused as Σ 10^6 // (60 + rank), top-10 per query. The
    SQL oracle recomputes BOTH rank lists and the fusion with the
    identical integer arithmetic."""
    from gridfia_ray.ann.hybrid import hybrid_topk

    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    emb = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return hybrid_topk(docs, emb, _TFIDF_QUERY_IDS, k=10, k_each=20)

def q_bpe_train_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer TRAINING (word-frequency table + per-
    round pair-count argmax exchanges) vs the pinned sequential trainer
    replay — merge lists must match rank-for-rank (determinism contract:
    max count, then lexicographically smallest pair)."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.bpe import train_bpe

    tune_context()
    docs = rd.read_parquet(oracle_pins.ensure_bpepin()["documents"])
    merges = train_bpe(docs, oracle_pins.BPE_PIN_MERGES)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )

def q_bpe_tokenize_pinned(sf_dir: str) -> pd.DataFrame:
    """BPE tokenization (actor-pool merge replay, per-actor word
    memoization) with the pinned merge list vs per-doc counts from the
    sequential replay."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.bpe import tokenize_count

    tune_context()
    pin = oracle_pins.ensure_bpepin()
    exp = _pq.read_table(pin["merges_expected"])
    merges = list(zip(exp["left"].to_pylist(), exp["right"].to_pylist()))
    docs = rd.read_parquet(pin["documents"])
    out = tokenize_count(docs, merges, concurrency=2).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_normalize_pinned(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC canonicalization (text/ops.normalize_text) over the
    planted hazard corpus (decomposed accents, ligatures, fullwidth
    forms, NBSP) — cross-validated against DuckDB's ICU
    ``nfc_normalize``, a genuinely independent Unicode implementation
    computing live in the oracle (not a replay of ours). Compares the
    md5 of the normalized text plus the code-point count per doc."""
    import hashlib

    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.ops import normalize_text

    tune_context()
    pin = oracle_pins.ensure_normpin()
    out = (
        rd.read_parquet(pin["documents"])
        .map_batches(normalize_text, batch_format="pandas")
        .to_pandas()
    )
    out["h"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in out["text"]]
    out = out[["doc_id", "n_chars", "h"]].astype({"doc_id": np.int64, "n_chars": np.int64})
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_cdc_pinned(sf_dir: str) -> pd.DataFrame:
    """Content-defined chunking (gear rolling hash, FastCDC-family
    min/avg/max discipline, text/cdc.py): the vectorized 64-shifted-adds
    chunker vs the pinned byte-at-a-time stateful gear walk — chunk
    offsets, lengths and md5-64 fingerprints must match bit-for-bit.
    The pin corpus plants prefix edits and cross-doc splices, so the
    expected table itself certifies the shift-invariance fixed-size
    chunking lacks."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.cdc import cdc_chunk_batch

    tune_context()
    pin = oracle_pins.ensure_cdcpin()
    mn, av, mx = oracle_pins.CDC_PIN_SIZES
    out = (
        rd.read_parquet(pin["documents"])
        .map_batches(
            lambda b: cdc_chunk_batch(b, mn, av, mx), batch_format="pandas"
        )
        .to_pandas()
        .astype(np.int64)
    )
    return out.sort_values(["doc_id", "chunk_id"], ignore_index=True)

def q_doc_cdc_dedup_pinned(sf_dir: str) -> pd.DataFrame:
    """Sub-document (chunk-level) dedup over the CDC chunk table: dup
    chunk groups (hash, n_copies) via per-batch count combiner + tiny
    keyed merge; the planted prefix-edit/splice corpus guarantees a
    non-trivial group set. Oracle: GROUP BY/HAVING over the pinned
    expected chunk table."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg
    from gridfia_ray.text.cdc import cdc_chunk_batch

    tune_context()
    pin = oracle_pins.ensure_cdcpin()
    mn, av, mx = oracle_pins.CDC_PIN_SIZES
    chunks = rd.read_parquet(pin["documents"]).map_batches(
        lambda b: cdc_chunk_batch(b, mn, av, mx), batch_format="pandas"
    )

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("chunk_hash", as_index=False).size()
        return pd.DataFrame(
            {
                "chunk_hash": g["chunk_hash"].astype(np.int64),
                "n_copies": g["size"].astype(np.int64),
            }
        )

    agg = bucketed_agg(
        chunks.map_batches(count_partial, batch_format="pandas"),
        ["chunk_hash"],
        {"n_copies": ("n_copies", "sum")},
        n_buckets=8,
    )
    out = (
        agg.map_batches(
            lambda b: b[b["n_copies"] > 1], batch_format="pandas"
        )
        .to_pandas()
        .astype({"chunk_hash": np.int64, "n_copies": np.int64})
    )
    return out.sort_values("chunk_hash", ignore_index=True)

def q_doc_cdc_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Sub-document exact dedup with REWRITE (Lee et al. 2022 shape,
    CDC-chunk granularity, text/cdc.cdc_dedup_docs): corpus-wide first
    occurrence wins, later copies of a chunk are cut out and each doc
    reassembled from its kept byte ranges — three text-free exchanges
    plus the reassembly. Oracle: the identical first-occurrence rule +
    string_agg reassembly in SQL over the pinned expected chunk table
    (ASCII pin corpus ⇒ SQL character offsets == byte offsets)."""
    import hashlib

    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.context import tune_context
    from gridfia_ray.text.cdc import cdc_dedup_docs

    tune_context()
    pin = oracle_pins.ensure_cdcpin()
    mn, av, mx = oracle_pins.CDC_PIN_SIZES
    out = (
        cdc_dedup_docs(
            rd.read_parquet(pin["documents"]), mn, av, mx, n_buckets=8
        )
        .to_pandas()
    )
    out["h"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in out["text"]]
    out = out[["doc_id", "h", "n_kept", "n_dropped"]].astype(
        {"doc_id": np.int64, "n_kept": np.int64, "n_dropped": np.int64}
    )
    return out.sort_values("doc_id", ignore_index=True)

def q_doc_token_freq(sf_dir: str) -> pd.DataFrame:
    """Distributed wordcount: top-50 corpus tokens by frequency
    (vocabulary building). Per-batch value_counts combiner → bucketed
    keyed sum → tiny sort; deterministic tie-break (n desc, tok asc)."""
    from gridfia_ray.stages.agg_util import bucketed_agg
    from gridfia_ray.text.ops import token_freq_partial

    parts = _docs(sf_dir).map_batches(token_freq_partial, batch_format="pandas")
    agg = bucketed_agg(parts, ["tok"], {"n": ("n", "sum")})

    # per-block top-k before the driver fold: a token's total count is
    # complete within its bucket block, so the global top-50 is a subset
    # of the union of per-block top-50s — the driver sees O(50·buckets)
    # rows, not the whole vocabulary
    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "tok"], ascending=[False, True], kind="mergesort").head(50)

    out = agg.map_batches(local_topk, batch_format="pandas").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out = out.sort_values(["n", "tok"], ascending=[False, True], kind="mergesort").head(50)
    return out.reset_index(drop=True)

def q_doc_dedup_incremental(sf_dir: str) -> pd.DataFrame:
    """Continuous-ingestion dedup: index the first half of the corpus
    (doc_id < 250), anti-join the second half against it — returns the
    genuinely-new documents (first occurrence within the batch wins)."""
    import shutil
    import tempfile

    from gridfia_ray.dedup.incremental import build_hash_index, dedup_against_index

    docs = _docs(sf_dir)
    first, second = _split_docs_at(docs, 250)
    idx = tempfile.mkdtemp(prefix="hash_index_")
    try:
        build_hash_index(first, idx, n_shards=16)
        out = dedup_against_index(second, idx).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return (
        pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64)})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

def q_doc_near_dedup_incremental(sf_dir: str) -> pd.DataFrame:
    """Incremental NEAR-dup rejection against a persistent SimHash band
    index (round-2 VERDICT ask #6): index the first half (doc_id < 250),
    then keep only second-half docs that are neither within Hamming 3 of
    any indexed signature (exhaustive 8-band check) nor exact-text dups
    within the batch (min doc_id wins). Intra-batch NEAR dedup is the
    batch-level simhash_pairs operator by design, not this one."""
    import shutil
    import tempfile

    from gridfia_ray.dedup.incremental import build_near_index, near_dedup_against_index

    docs = _docs(sf_dir)
    first, second = _split_docs_at(docs, 250)
    idx = tempfile.mkdtemp(prefix="near_index_")
    try:
        build_near_index(first, idx, n_shards=16, n_bands=8)
        out = near_dedup_against_index(second, idx, max_hamming=3).to_pandas()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return (
        pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64)})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

def q_doc_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination, exact-substring variant: per doc, the
    number of DISTINCT benchmark snippets contained verbatim. Snippets
    broadcast once; docs stream (text/decontaminate.py)."""
    from gridfia_ray.text.decontaminate import snippet_hits

    snips = _bench_snippets(sf_dir)
    out = snippet_hits(_docs(sf_dir), snips).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "n_hits": pd.Series(dtype=np.int64)}
        )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_hits"] = out["n_hits"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_decontaminate_ngram(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination, hashed word-8-gram variant (the
    production formulation): per doc, how many distinct benchmark
    8-grams it contains, plus its own distinct-8-gram count. Benchmark
    hash set broadcast once; one searchsorted per batch."""
    from gridfia_ray.text.decontaminate import bench_ngram_hashes, ngram_decontaminate

    snips = _bench_snippets(sf_dir)
    bench = bench_ngram_hashes(snips, n=8)
    out = ngram_decontaminate(_docs(sf_dir), bench, n=8, keep_clean=True).to_pandas()
    out = out[out["n_ngrams"] > 0]  # 0-token docs have no grams on either side
    for c in ("doc_id", "n_hits", "n_ngrams"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_vocab_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct-token count (HyperLogLog p=14, ~0.8 % rel
    error): one streaming pass, per-block register combiners, bounded
    fan-in merge. Estimate is a pure function of the token set →
    bit-deterministic across partitionings; not SQL-expressible →
    rows-only here, accuracy + determinism pinned in
    tests/test_sketches.py (exact vocab is doc_token_freq ✓sql)."""
    from gridfia_ray.analysis.sketches import hll_distinct
    from gridfia_ray.text.hashing import token_hashes64

    def tok_hashes(batch: pd.DataFrame) -> np.ndarray:
        th, _ = token_hashes64(batch["text"].fillna("").tolist(), lower=True)
        return th

    est = hll_distinct(_docs(sf_dir), ["text"], p=14, hash_fn=tok_hashes)
    return pd.DataFrame({"vocab_est": np.asarray([int(round(est))], dtype=np.int64)})

def q_doc_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5-hash rank —
    partition/cluster-size invariant, pure map (no shuffle), exactly
    reproducible in SQL via hex-threshold compare."""
    from gridfia_ray.pipelines.sampling import split_by_hash

    out = split_by_hash(
        _docs(sf_dir).select_columns(["doc_id"]),
        rank_cols=["doc_id"],
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "split"]].sort_values("doc_id").reset_index(drop=True)

def q_doc_filter_chain(sf_dir: str) -> pd.DataFrame:
    """Flagship training-data filter composition (FineWeb-style chain),
    fully streamed: exact dedup (one bucketed exchange) → integer
    quality gates (token count in [20, 1000], alpha chars ≥ half of
    chars) → benchmark decontamination (broadcast snippet scan).
    Surviving doc_ids; every gate is integer-exact vs the SQL oracle."""
    import re

    from gridfia_ray.dedup.docs import exact_dedup_docs
    from gridfia_ray.text.decontaminate import snippet_hits

    def quality_gate(batch: pd.DataFrame) -> pd.DataFrame:
        ws, alpha = re.compile(r"\S+"), re.compile(r"[A-Za-z]")
        t = batch["text"].fillna("")
        n_tokens = t.map(lambda s: len(ws.findall(s))).to_numpy(np.int64)
        n_alpha = t.map(lambda s: len(alpha.findall(s))).to_numpy(np.int64)
        n_chars = t.str.len().to_numpy(np.int64)
        keep = (n_tokens >= 20) & (n_tokens <= 1000) & (2 * n_alpha >= n_chars)
        return batch.loc[keep, ["doc_id", "text"]]

    snips = _bench_snippets(sf_dir)
    survivors = (
        exact_dedup_docs(_docs(sf_dir))
        .map_batches(quality_gate, batch_format="pandas")
    )
    clean = snippet_hits(survivors, snips, keep_clean=True).map_batches(
        lambda b: b.loc[b["n_hits"] == 0, ["doc_id"]], batch_format="pandas"
    )
    out = clean.to_pandas()
    return (
        pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64)})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

def q_doc_source_cap(sf_dir: str) -> pd.DataFrame:
    """Domain balancing (pretraining corpus hygiene): keep at most 15
    docs per source, selected by deterministic md5 rank — partition and
    cluster-size invariant (pipelines/sampling.sample_per_key, the same
    machinery as the per-user event sampler)."""
    from gridfia_ray.pipelines.sampling import sample_per_key

    out = sample_per_key(
        _docs(sf_dir).select_columns(["doc_id", "source"]),
        key="source",
        k=15,
        rank_cols=["doc_id"],
    ).to_pandas()
    return (
        pd.DataFrame(
            {"doc_id": out["doc_id"].astype(np.int64), "source": out["source"].astype(str)}
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """LLM-ingestion chunker: 128-token windows with 16-token overlap,
    row-expanding flat-map (text/ops.chunk_documents) — exact string
    compare vs the SQL list-slicing oracle."""
    from gridfia_ray.text.ops import chunk_documents

    out = chunk_documents(_docs(sf_dir), chunk_tokens=128, overlap=16).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["chunk_idx"] = out["chunk_idx"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

def q_doc_heavy_tokens(sf_dir: str) -> pd.DataFrame:
    """EXACT heavy hitters via Count-Min prefilter + verify
    (analysis/sketches.heavy_hitters_exact): tokens with global count
    ≥ 800. Only CMS-candidate tokens ever shuffle — the sketch bounds
    the exchange regardless of vocabulary size; CMS never undercounts,
    so the candidate set is a superset and the verified result exact."""
    import re

    from gridfia_ray.analysis.sketches import heavy_hitters_exact
    from gridfia_ray.text.hashing import token_hashes64

    ws = re.compile(r"\S+")

    def items_fn(batch: pd.DataFrame):
        texts = batch["text"].fillna("").tolist()
        toks: list[str] = []
        for t in texts:
            toks.extend(ws.findall(t))
        hashes, _ = token_hashes64(texts)
        return np.array(toks, dtype=object), hashes

    def hashes_fn(batch: pd.DataFrame):
        # sketch pass: hashes only, no token-string materialization
        return token_hashes64(batch["text"].fillna("").tolist())[0]

    out = heavy_hitters_exact(
        _docs(sf_dir), items_fn, threshold=800, hashes_fn=hashes_fn
    )
    return (
        pd.DataFrame({"tok": out["item"].astype(str), "n": out["n"].astype(np.int64)})
        .sort_values("tok")
        .reset_index(drop=True)
    )

def q_doc_top_tokens_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source top-5 tokens by frequency — the grouped wordcount a
    corpus-composition report runs. (source, token) count combiner →
    bucketed keyed sum → grouped_topk (count desc, token asc); key
    cardinality unbounded (no driver state)."""
    from gridfia_ray.pipelines.sampling import grouped_topk
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        import re

        rows_s, rows_t = [], []
        for src, txt in zip(b["source"], b["text"]):
            t = (txt or "").strip()
            if t:
                toks = re.split(r"\s+", t)
                rows_s.extend([src] * len(toks))
                rows_t.extend(toks)
        if not rows_s:
            return pd.DataFrame(
                {"source": pd.Series(dtype=str), "tok": pd.Series(dtype=str),
                 "n": pd.Series(dtype=np.int64)}
            )
        out = (
            pd.DataFrame({"source": rows_s, "tok": rows_t})
            .value_counts()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    agg = bucketed_agg(
        _docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["source", "tok"],
        {"n": ("n", "sum")},
    )
    out = grouped_topk(
        agg, "source", 5, "n", descending=True, tie_cols=["tok"]
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return (
        out[["source", "tok", "n"]]
        .sort_values(["source", "n", "tok"], ascending=[True, False, True])
        .reset_index(drop=True)
    )

def q_doc_para_dedup(sf_dir: str) -> pd.DataFrame:
    """Cross-document paragraph dedup (keep first occurrence):
    boilerplate removal. Exact string compare vs the SQL oracle."""
    from gridfia_ray.dedup.docs import paragraph_dedup

    out = paragraph_dedup(_docs(sf_dir)).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_substr_dedup(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr-style duplicate-span removal (Lee et al. ACL 2022,
    text/substr.py): every 10-token window occurring more than once in
    the corpus keeps only its first occurrence; all other occurrences
    are cut from their documents and the survivors re-joined. One
    bucketed window exchange (16 B/window rows) + one doc_id co-bucket
    rewrite — no broadcast, no driver fold. Exact string compare vs
    the SQL window-replay oracle."""
    from gridfia_ray.text.substr import substr_dedup_docs

    # 16 buckets at sf scale: result is bucket-count invariant (pinned
    # by the partition-invariance tests); 64 nearly-empty sort
    # partitions per exchange are pure task overhead in the window
    out = substr_dedup_docs(
        _docs(sf_dir), min_len=_SUBSTR_LEN, n_buckets=16
    ).to_pandas()
    out = out[["doc_id", "n_tokens", "n_removed", "text_clean"]]
    for c in ("doc_id", "n_tokens", "n_removed"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_textrank(sf_dir: str) -> pd.DataFrame:
    """TextRank keyword scores (text/textrank.textrank_scores —
    Mihalcea & Tarau 2004): integer-exact PageRank over the word
    co-occurrence graph, vs the unrolled 3-iteration SQL replay over
    the identical graph construction."""
    from gridfia_ray.text.textrank import textrank_scores

    out = textrank_scores(_docs(sf_dir), n_buckets=8)
    out["word"] = out["word"].astype(str)
    out["rank_c"] = out["rank_c"].astype(np.int64)
    return out

def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Integer-exact quality counts (ratios derive from these)."""
    import re

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        ws, alpha, punct = re.compile(r"\S+"), re.compile(r"[A-Za-z]"), re.compile(r"[.,;:!?]")
        t = batch["text"].fillna("")
        out = batch[["doc_id"]].copy()
        out["n_chars"] = t.str.len().astype(np.int64)
        out["n_tokens"] = t.map(lambda s: len(ws.findall(s))).astype(np.int64)
        out["n_alpha"] = t.map(lambda s: len(alpha.findall(s))).astype(np.int64)
        out["n_punct"] = t.map(lambda s: len(punct.findall(s))).astype(np.int64)
        return out

    out = _docs(sf_dir).map_batches(counts, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_outlier_mad(sf_dir: str) -> pd.DataFrame:
    """Robust per-source length-outlier scrub: median + MAD of n_chars
    per source (pipelines/percentiles.grouped_mad_exact — two exact
    grouped selection rounds, values never shuffle), then one broadcast
    flag pass keeping docs with |n_chars − med| > 3·MAD. The robust-z
    data-cleaning staple: unlike mean/σ, the cut is immune to the very
    outliers being hunted. Integer n_chars keep every comparison
    hash-exact vs the DuckDB quantile_disc oracle."""
    import ray

    from gridfia_ray.context import tune_context
    from gridfia_ray.pipelines.percentiles import grouped_mad_exact

    tune_context()
    docs = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )
    stats = grouped_mad_exact(docs, "source", "n_chars")
    ref = ray.put(
        {
            "med": dict(zip(stats["source"], stats["median"])),
            "mad": dict(zip(stats["source"], stats["mad"])),
        }
    )

    import pyarrow as pa

    from gridfia_ray.stages.agg_util import to_arrow

    flag_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )

    def flag(batch: pd.DataFrame) -> pa.Table:
        s = ray.get(ref)
        v = batch["n_chars"].to_numpy(np.float64)
        med = batch["source"].map(s["med"]).to_numpy(np.float64)
        mad = batch["source"].map(s["mad"]).to_numpy(np.float64)
        kept = batch.loc[np.abs(v - med) > 3.0 * mad]
        # typed Arrow out: an all-filtered batch with an object 'source'
        # column otherwise trips the executor's size estimator
        return to_arrow(kept[["doc_id", "source", "n_chars"]], flag_schema)

    out = docs.map_batches(flag, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "source": pd.Series(dtype=str),
                "n_chars": pd.Series(dtype=np.int64),
            }
        )
    out = out[["doc_id", "source", "n_chars"]]
    for c in ("doc_id", "n_chars"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_compress_ratio(sf_dir: str) -> pd.DataFrame:
    """zlib compression-ratio quality signal (text/ops.compression_stats):
    integer (raw_len, zlib_len, ratio_milli) per doc. Deterministic but
    not SQL-expressible (DuckDB has no zlib) → rows-only here; exactly
    oracled vs a sequential zlib replay in tests/test_text_ops.py."""
    from gridfia_ray.text.ops import compression_stats

    out = _docs(sf_dir).map_batches(compression_stats, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_fertility(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility per detected language — Σ BPE-pre-tokens /
    Σ whitespace words grouped by the stopword-profile language (the
    tokenizer-evaluation staple: tokens per word by language). ONE
    fused actor pass (LangId + both token counters + a per-batch
    language combiner) then a tiny keyed merge bounded by the language
    inventory; the ratio is one double division mirrored in SQL
    (-1 sentinel for a zero-word group)."""
    from gridfia_ray.context import tune_context
    from gridfia_ray.stages.agg_util import bucketed_agg, to_arrow
    from gridfia_ray.stages.worker_state import worker_cached
    from gridfia_ray.text.ops import LangId, bpe_token_count, token_count

    tune_context()
    import pyarrow as pa

    part_schema = pa.schema(
        [("lang_pred", pa.string()), ("n_words", pa.int64()),
         ("n_bpe", pa.int64())]
    )

    class _Fertility(LangId):
        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            lang = super().__call__(batch)["lang_pred"]
            g = pd.DataFrame(
                {
                    "lang_pred": lang,
                    "n_words": token_count(batch)["n_tokens"].to_numpy(
                        np.int64
                    ),
                    "n_bpe": bpe_token_count(batch)[
                        "n_bpe_tokens"
                    ].to_numpy(np.int64),
                }
            ).groupby("lang_pred", as_index=False).sum()
            return to_arrow(g, part_schema)

    parts = _docs(sf_dir).map_batches(
        worker_cached(_Fertility), batch_format="pandas"
    )
    out = bucketed_agg(
        parts, ["lang_pred"],
        {"n_words": ("n_words", "sum"), "n_bpe": ("n_bpe", "sum")},
        n_buckets=4,
    ).to_pandas()
    out = out.astype({"n_words": np.int64, "n_bpe": np.int64})
    w = out["n_words"].to_numpy(np.float64)
    b = out["n_bpe"].to_numpy(np.float64)
    out["fertility_u"] = np.where(
        out["n_words"].to_numpy() == 0,
        np.int64(-1),
        np.floor(b / np.where(w == 0, 1.0, w) * 1_000_000 + 0.5).astype(
            np.int64
        ),
    ).astype(np.int64)
    return out.sort_values("lang_pred", ignore_index=True)

def q_doc_langid(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.stages.worker_state import worker_cached
    from gridfia_ray.text.ops import LangId

    out = (
        _docs(sf_dir)
        .map_batches(worker_cached(LangId), batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_langid_ngram(sf_dir: str) -> pd.DataFrame:
    """Real language ID: 16-language character-trigram profiles +
    7-language Unicode-script detection (text/langid.py). Integer
    weights keep the argmax hash-exact vs the SQL oracle."""
    from gridfia_ray.stages.worker_state import worker_cached
    from gridfia_ray.text.langid import NgramLangId

    out = (
        _docs(sf_dir)
        .map_batches(worker_cached(NgramLangId), batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.text.ops import fingerprint64

    out = _docs(sf_dir).map_batches(fingerprint64, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.dedup.docs import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(sf_dir), threshold=0.5).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"]).reset_index(drop=True)

def q_doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (dup lines, top-bigram
    multiplicity) — integer-exact, SQL-oracle-checked."""
    from gridfia_ray.text.ops import repetition_stats

    out = _docs(sf_dir).map_batches(repetition_stats, batch_format="pandas").to_pandas()
    for c in ["n_lines", "n_dup_lines", "n_2grams", "top2gram_count"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_dup_verified(sf_dir: str) -> pd.DataFrame:
    """EXACT n-gram (k=3 word shingle) Jaccard near-dup pairs at
    threshold 0.5 — prefix-filtered inverted index + keyed re-join
    verification; SQL-checkable (unlike the MinHash estimate)."""
    from gridfia_ray.dedup.docs import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs(sf_dir), k=3, threshold=0.5).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "jaccard_u": pd.Series(dtype=np.int64)}
        )
    res = out[["a", "b"]].astype(np.int64)
    res["jaccard_u"] = s6(out["jaccard"])
    return res.sort_values(["a", "b"]).reset_index(drop=True)

def q_doc_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components over the exact n-gram Jaccard pairs →
    (doc_id, cluster_rep) with rep = min of the component; the oracle
    computes the transitive closure with a recursive CTE over the SAME
    pair relation."""
    from gridfia_ray.dedup.docs import dup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs(sf_dir), k=3, threshold=0.5)
    out = dup_clusters(pairs)
    return out.sort_values("doc_id").reset_index(drop=True)

def q_doc_canonical_dedup(sf_dir: str) -> pd.DataFrame:
    """Near-dup dedup with canonical selection (dedup/docs.
    canonical_dedup_docs): one survivor per Jaccard cluster — the
    LONGEST doc, ties to the smaller id — plus every unclustered doc.
    The winner pick is a packed-int64 per-cluster MAX combiner; oracle
    = the recursive-CTE closure + a ROW_NUMBER quality pick."""
    from gridfia_ray.dedup.docs import canonical_dedup_docs

    out = canonical_dedup_docs(_docs(sf_dir), k=3, threshold=0.5).to_pandas()
    return (
        pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64)})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

def q_doc_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    from gridfia_ray.dedup.docs import simhash_pairs

    out = simhash_pairs(_docs(sf_dir), max_hamming=3).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"]).reset_index(drop=True)

def q_doc_minhash_pinned(sf_dir: str) -> pd.DataFrame:
    """The distributed MinHash-LSH banding/verify machinery vs its
    pinned sequential replay (oracle_pins) — full hash check of the
    partition-invariance property the sf-table variant can only assert
    rows-only."""
    from gridfia_ray.dedup.docs import minhash_lsh_pairs

    out = minhash_lsh_pairs(_pin_docs(), threshold=0.5).to_pandas()
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"], ignore_index=True)

def q_doc_simhash_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed SimHash exhaustive banding vs its pinned sequential
    replay (oracle_pins)."""
    from gridfia_ray.dedup.docs import simhash_pairs

    out = simhash_pairs(_pin_docs(), max_hamming=3).to_pandas()
    return out[["a", "b"]].astype(np.int64).sort_values(["a", "b"], ignore_index=True)

def q_doc_hll_pinned(sf_dir: str) -> pd.DataFrame:
    """Distributed HLL register merge vs its pinned sequential replay:
    max-merge is order-free, so the estimate must be bit-identical."""
    from gridfia_ray.analysis.sketches import hll_distinct
    from gridfia_ray.text.hashing import token_hashes64

    def tok_hashes(batch: pd.DataFrame) -> np.ndarray:
        th, _ = token_hashes64(batch["text"].fillna("").tolist(), lower=True)
        return th

    est = hll_distinct(_pin_docs(), ["text"], p=14, hash_fn=tok_hashes)
    return pd.DataFrame({"vocab_est": np.asarray([int(round(est))], dtype=np.int64)})

def q_ghll_pinned(sf_dir: str) -> pd.DataFrame:
    """Grouped HLL (approximate distinct per group — the scale path for
    per-day uniques) vs its pinned sequential register replay: the
    bucketed max-merge is order-free, so every per-group estimate must
    be bit-identical at any partitioning."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.analysis.sketches import grouped_hll_distinct
    from gridfia_ray.context import tune_context

    tune_context()
    rows = rd.read_parquet(oracle_pins.ensure_ghllpin()["rows"])
    out = grouped_hll_distinct(rows, ["day"], ["user_id"], p=12).to_pandas()
    out["est_u"] = np.floor(out["approx_distinct"] * 1_000_000 + 0.5).astype(np.int64)
    return out[["day", "est_u"]].sort_values("day", ignore_index=True)

def q_ddq_pinned(sf_dir: str) -> pd.DataFrame:
    """Grouped DDSketch quantiles (one-pass relative-error sketch — the
    scale path next to the exact multi-pass quickselect) vs the pinned
    sequential bucket-key replay: counts merge by addition, so every
    per-group quantile must be bit-identical at any partitioning."""
    import ray.data as rd

    from gridfia_ray import oracle_pins
    from gridfia_ray.analysis.sketches import grouped_dd_quantiles
    from gridfia_ray.context import tune_context

    tune_context()
    rows = rd.read_parquet(oracle_pins.ensure_ddqpin()["rows"])
    out = grouped_dd_quantiles(
        rows, ["grp"], "v", [1.0, 50.0, 99.0], alpha=0.01
    ).to_pandas()
    for c in ("q1", "q50", "q99"):
        out[f"{c}_u"] = np.floor(out[c] * 1_000_000 + 0.5).astype(np.int64)
    return out[["grp", "q1_u", "q50_u", "q99_u"]].sort_values(
        "grp", ignore_index=True
    )
