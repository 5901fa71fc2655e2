"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline stages (per the build brief; the
GridFIA reference has no text path): token counting, quality scoring,
n-gram language ID, rolling-hash fingerprinting. Every operator is a
``map_batches`` stage: the stateful ones (compiled regexes, stopword
tables) are callable classes → actor pools; pure ones are plain
functions. All return pandas batches (string processing is pandas'
wheelhouse).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\S+")
_ALPHA = re.compile(r"[A-Za-z]")
_PUNCT = re.compile(r"[.,;:!?'\"()\[\]{}-]")

# tiny per-language stopword profiles (public common-word lists)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "was", "this"},
    # ASCII-only stopwords: the SQL oracle tokenizes with RE2 '[a-z]+',
    # which cannot match non-ASCII letters — a 'für'-style entry would
    # score on the Python side but never in SQL (structural drift)
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "auf", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour", "que", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "que", "por", "para", "del"},
}


def token_count(batch: pd.DataFrame) -> pd.DataFrame:
    """n_tokens = count of \\S+ runs (whitespace tokenization)."""
    out = batch[["doc_id"]].copy()
    out["n_tokens"] = batch["text"].map(lambda t: len(_WS.findall(t or "")))
    return out


# GPT-2-style pre-tokenizer classes (public BPE pre-tokenization shape:
# letter runs, digit runs, punctuation runs — each absorbing one leading
# space — plus residual whitespace), restricted to RE2-compatible syntax
# (no lookahead) so the SAME pattern runs in the DuckDB oracle.
_BPE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s")


def bpe_token_count(batch: pd.DataFrame) -> pd.DataFrame:
    """n_bpe_tokens = count of BPE-style pre-tokenizer matches — the
    standard proxy for LLM token cost (≈ tokens before merges)."""
    out = batch[["doc_id"]].copy()
    out["n_bpe_tokens"] = (
        batch["text"].fillna("").str.count(_BPE).astype(np.int64)
    )
    return out


class QualityScorer:
    """Heuristic quality features: char/token counts, alphabetic and
    punctuation ratios, mean token length — the classic pre-training
    quality filters (length/punct/stopword ratios). Stateful stage:
    regexes compiled once per actor."""

    def __init__(self):
        self.ws = re.compile(r"\S+")
        self.alpha = re.compile(r"[A-Za-z]")
        self.punct = re.compile(r"[.,;:!?'\"()\[\]{}-]")
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        toks = texts.map(self.ws.findall)
        n_chars = texts.str.len().astype(np.int64)
        n_tokens = toks.map(len).astype(np.int64)
        out = batch[["doc_id"]].copy()
        out["n_chars"] = n_chars
        out["n_tokens"] = n_tokens
        out["alpha_ratio"] = np.where(
            n_chars > 0, texts.map(lambda t: len(self.alpha.findall(t))) / n_chars, 0.0
        )
        out["punct_ratio"] = np.where(
            n_chars > 0, texts.map(lambda t: len(self.punct.findall(t))) / n_chars, 0.0
        )
        out["mean_token_len"] = np.where(
            n_tokens > 0, toks.map(lambda ts: sum(len(t) for t in ts)) / n_tokens, 0.0
        )
        out["stopword_ratio"] = np.where(
            n_tokens > 0,
            toks.map(lambda ts: sum(1 for t in ts if t.lower() in self.stop)) / n_tokens,
            0.0,
        )
        return out


class LangId:
    """Stopword-profile language ID (n-gram-free heuristic): the language
    whose stopword set covers the most tokens wins; 'und' (undetermined)
    when no profile scores > 0. First-wins tie rule in dict order
    (en > de > fr > es), mirrored by the SQL oracle.

    Vectorized: tokens hash once per batch (flat 64-bit array); each
    profile is a pre-hashed array and scoring is one ``np.isin`` +
    segment-sum per language — no per-token Python."""

    def __init__(self):
        from gridfia_ray.text.hashing import token_hashes64

        # ASCII letter runs over lowered text — the EXACT tokenization
        # the SQL oracle uses (regexp_extract_all(lower(text),'[a-z]+')),
        # so the two sides cannot drift on non-ASCII input
        self.word = re.compile(r"[a-z]+")
        self.langs = list(_LANG_STOPWORDS)
        self.profile_hashes = {
            lang: np.sort(token_hashes64(sorted(words))[0])
            for lang, words in _LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from gridfia_ray.text.hashing import token_hashes64

        texts = batch["text"].fillna("").tolist()
        th, counts = token_hashes64(texts, pattern=self.word, lower=True)
        doc_idx = np.repeat(np.arange(len(texts)), counts)
        scores = np.zeros((len(texts), len(self.langs)), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            hit = np.isin(th, self.profile_hashes[lang], assume_unique=False)
            if hit.any():
                scores[:, li] = np.bincount(doc_idx[hit], minlength=len(texts))
        # strict-improvement scan == the scalar loop's first-wins rule
        best = np.zeros(len(texts), dtype=np.int64) - 1
        best_score = np.zeros(len(texts), dtype=np.int64)
        for li in range(len(self.langs)):
            better = scores[:, li] > best_score
            best[better] = li
            best_score[better] = scores[better, li]
        preds = np.asarray(["und", *self.langs], dtype=object)[best + 1]
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = preds
        return out


def token_freq_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner for the global token-frequency table (the
    vocabulary-building wordcount): one value_counts over the batch's
    flat token list → (tok, n) partial rows. Feed through a bucketed
    keyed sum; at 10^12 docs the shuffle carries only distinct-token
    partials per batch, never token instances."""
    toks: list[str] = []
    for t in batch["text"].fillna(""):
        toks.extend(_WS.findall(t))
    if not toks:
        return pd.DataFrame({"tok": pd.Series(dtype=str), "n": pd.Series(dtype=np.int64)})
    vc = pd.Series(toks).value_counts()
    return pd.DataFrame({"tok": vc.index.astype(str), "n": vc.to_numpy(np.int64)})


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals (public pre-training filter
    heuristics — Rae et al. 2021 §A1.1): duplicate-line counts and the
    most-frequent-bigram count. Integer-exact columns so the operator is
    SQL-oracle-checkable:

      n_lines, n_dup_lines (lines minus distinct lines),
      n_2grams (strict windows), top2gram_count (max multiplicity).

    Bigram counting is vectorized over the batch's flat token-hash
    array (64-bit hashes stand in for string equality; collision
    probability ≈ n²/2^64)."""
    from gridfia_ray.text.hashing import (
        max_count_per_doc,
        ngram_hashes64,
        token_hashes64,
    )

    texts = batch["text"].fillna("").tolist()
    out = batch[["doc_id"]].copy()
    n_lines = np.empty(len(texts), np.int64)
    n_dup = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        n_lines[i] = len(lines)
        n_dup[i] = len(lines) - len(set(lines))
    th, counts = token_hashes64(texts)
    bg, bg_counts = ngram_hashes64(th, counts, k=2)
    out["n_lines"] = n_lines
    out["n_dup_lines"] = n_dup
    out["n_2grams"] = bg_counts
    out["top2gram_count"] = max_count_per_doc(bg, bg_counts)
    return out


def fingerprint64(batch: pd.DataFrame) -> pd.DataFrame:
    """Order-sensitive 64-bit document fingerprint: polynomial rolling
    hash over the whitespace token sequence (public Rabin–Karp style).
    Evaluated vectorized (text/hashing.py) — value-identical to the
    per-character Horner loops it replaced (pinned in tests)."""
    from gridfia_ray.text.hashing import fingerprint64_batch

    out = batch[["doc_id"]].copy()
    out["fingerprint"] = fingerprint64_batch(batch["text"].fillna("").tolist())
    return out


def normalize_text(
    batch: pd.DataFrame, form: str = "NFC", casefold: bool = False
) -> pd.DataFrame:
    """Unicode canonicalization before hashing/dedup: the same visible
    string can arrive precomposed or decomposed (é vs e+◌́), with
    compatibility forms (ﬁ, fullwidth digits), or case variants — all
    of which defeat exact-hash dedup unless normalized first. Returns
    (doc_id, text, n_chars) with ``text`` normalized to ``form``
    (optionally casefolded); n_chars counts post-normalization code
    points. Per-doc unicodedata.normalize is a C call; the NFC path is
    cross-validated against DuckDB's independent ICU implementation in
    the contract (doc_normalize_pinned)."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    texts = [
        unicodedata.normalize(form, t) for t in batch["text"].fillna("")
    ]
    if casefold:
        texts = [t.casefold() for t in texts]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "text": pd.Series(texts, dtype=str),
            "n_chars": pd.Series([len(t) for t in texts], dtype=np.int64),
        }
    )


def compression_stats(batch: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    """zlib compression-ratio quality signal: machine-generated or
    boilerplate-heavy text compresses far below natural prose, making
    ``compressed/raw`` a cheap repetition filter (used alongside the
    Gopher-style ratios in public pre-training pipelines, e.g.
    RefinedWeb/Dolma). Per doc: ``raw_len`` (UTF-8 bytes), ``zlib_len``
    at a pinned level, and ``ratio_milli = (1000·zlib_len) // raw_len``
    — all integers, fully determined by input + level, so the operator
    is exactly reproducible by a sequential replay (tests/test_text_ops)
    though not SQL-expressible (DuckDB has no zlib surface). C-speed per
    doc via the zlib module; doc granularity like the other quality
    scorers."""
    import zlib

    texts = batch["text"].fillna("")
    raw = [t.encode("utf-8") for t in texts]
    raw_len = np.asarray([len(b) for b in raw], np.int64)
    zlib_len = np.asarray([len(zlib.compress(b, level)) for b in raw], np.int64)
    out = batch[["doc_id"]].copy()
    out["raw_len"] = raw_len
    out["zlib_len"] = zlib_len
    # empty doc: zlib emits a ~8-byte header; define ratio 0 rather
    # than divide-by-zero (filters treat empty docs separately anyway)
    out["ratio_milli"] = np.where(raw_len > 0, (1000 * zlib_len) // np.maximum(raw_len, 1), 0).astype(np.int64)
    return out


def chunk_documents(
    docs: "rd.Dataset",
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "rd.Dataset":
    """Split documents into fixed-size token windows with overlap — the
    standard LLM training / RAG ingestion chunker. Row-expanding
    ``map_batches`` (Ray's flat-map shape): window starts advance by
    ``chunk_tokens − overlap`` and stop once the remaining tokens are
    already covered by the previous window (no fully-redundant trailing
    chunk — a duplicate window would inflate a RAG index / training set
    with exact-duplicate text). Chunk text is the window's tokens
    joined with single spaces
    (whitespace-normalized — chunker output feeds tokenizers, not
    renderers). Pure map, no shuffle; token-level Python work at doc
    granularity (same cost class as the quality scorers)."""
    if chunk_tokens < 1 or not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need chunk_tokens >= 1 and 0 <= overlap < chunk_tokens, got "
            f"{chunk_tokens=}, {overlap=}"
        )
    step = chunk_tokens - overlap

    def chunk(batch: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, ns, texts = [], [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            toks = _WS.findall(text)
            if not toks:
                continue
            # stop at len - overlap: a window starting beyond that is
            # fully contained in its predecessor
            for ci, start in enumerate(range(0, max(1, len(toks) - overlap), step)):
                window = toks[start : start + chunk_tokens]
                ids.append(doc_id)
                idxs.append(ci)
                ns.append(len(window))
                texts.append(" ".join(window))
        from gridfia_ray.stages.agg_util import to_arrow

        # Arrow out: a batch of all-empty docs yields 0 rows, and an
        # empty pandas block would churn the executor schema cache
        return to_arrow(
            pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=batch[id_col].dtype),
                    "chunk_idx": pd.Series(idxs, dtype=np.int64),
                    "n_tokens": pd.Series(ns, dtype=np.int64),
                    "chunk": pd.Series(texts, dtype=str),
                }
            )
        )

    return docs.map_batches(chunk, batch_format="pandas")


# PII scrubbing — RE2-compatible patterns (no lookaround) so the SAME
# patterns run verbatim in the DuckDB oracle's regexp_replace. Applied
# in a fixed order (email → IPv4 → intl phone); both engines use
# leftmost-first non-overlapping replacement. Compiled with re.ASCII so
# \d and \b match RE2's ASCII-only semantics — Python's Unicode-aware
# defaults would diverge on non-ASCII text (the same drift class the
# _LANG_STOPWORDS comment guards against).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{9,15}", "<PHONE>"),
)
_PII_COMPILED = [(re.compile(p, re.ASCII), tok) for p, tok in PII_PATTERNS]


def redact_pii(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, text) → (doc_id, text_redacted, n_redactions): emails,
    IPv4 addresses and international-format phone numbers replaced by
    typed placeholder tokens — the standard pre-training scrub stage.
    Pure map, no shuffle; patterns compile once at import."""
    out = batch[["doc_id"]].copy()
    text = batch["text"].fillna("")
    n = np.zeros(len(batch), dtype=np.int64)
    for pat, tok in _PII_COMPILED:
        n += text.str.count(pat).to_numpy(np.int64)
        text = text.str.replace(pat, tok, regex=True)
    out["text_redacted"] = text
    out["n_redactions"] = n
    return out
