"""Byte-pair-encoding tokenizer TRAINING and application as Ray Data
pipelines — the canonical LLM-pipeline operator the reference lacks
(SURVEY §2.9 text family; Sennrich et al. 2016 word-frequency form).

Scale shape (why this distributes correctly at 100 TB):

  * ONE streaming pass over the corpus builds the WORD-FREQUENCY table
    (per-batch Counter combiner → bucketed exchange keyed on the word).
    Everything after runs on that table, whose size is the unique-word
    vocabulary — orders of magnitude smaller than the corpus and
    hash-partitioned.
  * each merge round is two table-local steps: a pair-count combiner
    (per-batch Counter over adjacent symbol pairs, weighted by word
    frequency) whose bucketed merge emits only PER-BUCKET ARGMAX rows
    (the driver folds ≤ n_buckets candidates, never the pair table),
    and a vectorized merge-apply map. The word table is re-materialized
    per round (K rounds ⇒ K small passes over the vocabulary, zero
    passes over the corpus).
  * tokenization is an actor-pool ``map_batches`` stage: merges load
    once per actor, words memoize per actor, docs stream.

Symbol representation: a word's current symbols are joined with NUL
("\\x00") and wrapped in leading/trailing NULs, so a merge (a, b) is
the literal replace of "\\0a\\0b\\0" with "\\0ab\\0" — Python's
left-to-right non-overlapping ``str.replace`` IS the BPE greedy merge
scan, and symbol boundaries can't false-match because text never
contains NUL (enforced at word-count time).

Determinism contract (what the pinned sequential replay reproduces
bit-for-bit): merge ranks are chosen by (max count, then
lexicographically smallest (a, b)); the per-bucket argmax uses the
same ordering, so the fold is associative and partition-invariant.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WORD_RE = re.compile(r"\S+")
_SEP = "\x00"


def pretokenize(text: str) -> list[str]:
    """Whitespace pretokenizer with an explicit end-of-word marker so
    merges can't cross word boundaries (the </w> of the BPE paper)."""
    return [w + "</w>" for w in _WORD_RE.findall(text)]


def _rep_of(word: str) -> str:
    """Initial symbol rep: every character is a symbol, except the
    trailing '</w>' marker which is one symbol."""
    if word.endswith("</w>"):
        syms = list(word[:-4]) + ["</w>"]
    else:
        syms = list(word)
    return _SEP + _SEP.join(syms) + _SEP


def word_frequency_table(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Distributed word-frequency table (word, freq) — the one corpus
    pass of BPE training."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            if _SEP in t:
                raise ValueError("bpe: NUL byte in document text")
            c.update(pretokenize(t))
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "freq": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    return bucketed_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["word"],
        {"freq": ("freq", "sum")},
        n_buckets=32,
    )


def _pair_partials(n_buckets: int):
    """Per-batch pair-count combiner, bucket key attached inline (one
    fused map instead of count-then-bucket)."""

    def fn(batch: pd.DataFrame) -> pa.Table:
        import zlib

        c: Counter = Counter()
        for rep, freq in zip(batch["rep"], batch["freq"]):
            syms = rep.strip(_SEP).split(_SEP)
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += int(freq)
        pairs = sorted(c)
        return pa.table(
            {
                "__bucket": pa.array(
                    [
                        zlib.crc32((p[0] + _SEP + p[1]).encode()) % n_buckets
                        for p in pairs
                    ],
                    pa.int32(),
                ),
                "left": pa.array([p[0] for p in pairs], pa.string()),
                "right": pa.array([p[1] for p in pairs], pa.string()),
                "cnt": pa.array([c[p] for p in pairs], pa.int64()),
            }
        )

    return fn


def _bucket_argmax(group: pd.DataFrame) -> pd.DataFrame:
    """Sum one bucket's partials per pair, emit the (count desc, pair
    asc) argmax — the only row of this bucket that reaches the driver."""
    g = group.groupby(["left", "right"], as_index=False)["cnt"].sum()
    g = g.sort_values(
        ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
    ).iloc[:1]
    return g[["left", "right", "cnt"]]


def train_bpe(
    docs: rd.Dataset, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a document dataset. Returns
    the ordered merge list; stops early when no adjacent pair is left
    (fully merged vocabulary)."""
    wf = word_frequency_table(docs, text_col)

    def to_rep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rep": pa.array(
                    [_rep_of(w) for w in batch["word"].to_pylist()], pa.string()
                ),
                "freq": batch["freq"],
            }
        )

    table = wf.map_batches(to_rep, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    n_buckets = 8
    for _ in range(n_merges):
        cand = (
            table.map_batches(_pair_partials(n_buckets), batch_format="pandas")
            .groupby("__bucket")
            .map_groups(_bucket_argmax, batch_format="pandas")
            .to_pandas()
        )
        if len(cand) == 0:
            break
        cand = cand.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        a, b = str(cand.iloc[0]["left"]), str(cand.iloc[0]["right"])
        merges.append((a, b))
        pat = _SEP + a + _SEP + b + _SEP
        rep = _SEP + a + b + _SEP

        def apply(batch: pa.Table, pat=pat, rep=rep) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "rep": pc.replace_substring(batch["rep"], pat, rep),
                    "freq": batch["freq"],
                }
            )

        table = table.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize ONE pretokenized word by replaying the merge list in
    rank order — identical semantics to the training evolution."""
    rep = _rep_of(word)
    for a, b in merges:
        pat = _SEP + a + _SEP + b + _SEP
        if pat in rep:
            rep = rep.replace(pat, _SEP + a + b + _SEP)
    return rep.strip(_SEP).split(_SEP)


class BpeTokenizeCounter:
    """Actor-pool tokenizer: merges load once per actor, per-word
    segmentations memoize across batches; emits (doc_id, n_tokens)."""

    _CACHE_CAP = 2_000_000  # ~100 MB worst case; Zipf makes hits cheap

    def __init__(self, merges: list[tuple[str, str]]):
        self._merges = [(str(a), str(b)) for a, b in merges]
        self._cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(apply_merges(word, self._merges))
            if len(self._cache) >= self._CACHE_CAP:
                # bound actor memory on unbounded vocabularies: evict in
                # insertion order (dict popitem is LIFO; the Zipf head
                # re-inserts immediately, the long tail never returns)
                self._cache.pop(next(iter(self._cache)))
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        counts = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            counts[i] = sum(self._n_tokens(w) for w in pretokenize(t))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        )


def tokenize_count(
    docs: rd.Dataset, merges: list[tuple[str, str]], concurrency: int = 4
) -> rd.Dataset:
    """Per-document BPE token counts via the actor-pool stage."""
    return docs.map_batches(
        BpeTokenizeCounter,
        fn_constructor_kwargs={"merges": merges},
        # autoscaling (min 1): a fixed pool sized to the cluster can
        # pin every CPU and starve downstream stages on small clusters
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )
