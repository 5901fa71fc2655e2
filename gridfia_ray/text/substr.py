"""ExactSubstr-style duplicate-span removal (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022): any ``min_len``-
token window whose exact text occurs more than once in the corpus is a
duplicate span, and every occurrence except the canonical first is cut
from its document — the pass that removes repeated boilerplate *inside*
otherwise-unique documents, which document-level and paragraph-level
dedup both miss.

The paper's suffix-array formulation needs a global sorted index; the
equivalent fixed-window formulation below is what a bucketed shuffle
engine can run at corpus scale:

1. window pass — every doc explodes to one (window-hash, packed
   doc/pos key) row per ``min_len``-token window.  Rows are two int64
   columns (16 B/window: the window TEXT never leaves the batch), so
   the exchange volume is ~2 words per corpus token.
2. ONE bucketed exchange keyed on the window hash: each bucket groups
   its hashes, keeps the canonical first occurrence (min packed key =
   lexicographic (doc_id, pos), the paragraph-dedup rule), and emits
   only the NON-canonical occurrences — output bounded by duplicate
   occurrences, not corpus size.
3. rewrite pass — duplicate spans co-bucket with their documents on
   doc_id; per doc the covered token positions (union of [pos,
   pos+min_len) intervals) are dropped and the survivors re-joined.

No driver fold and no broadcast anywhere: the duplicate-window set at
web scale is itself huge (it IS the boilerplate vocabulary), so it
stays a distributed table throughout.

Windows are keyed on the top 63 bits of md5(window text) — the same
collision-negligible keying as paragraph dedup (``dedup.docs._md5_64``)
— which lets the DuckDB oracle reproduce the grouping with ``md5()``.

No counterpart in the GridFIA reference (build brief: LLM-pipeline
dedup family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from gridfia_ray.dedup.docs import _md5_64

# packed occurrence key = doc_id * _POS_BASE + pos (1-based pos). Ties
# break lexicographically on (doc_id, pos) because pos < _POS_BASE is
# enforced at explode time.
_POS_BASE = 1_000_000


def _is_null_text(text) -> bool:
    return text is None or (isinstance(text, float) and np.isnan(text))


def substr_dup_spans(
    docs: rd.Dataset, min_len: int = 10, n_buckets: int = 64
) -> rd.Dataset:
    """(doc_id, pos) of every NON-canonical duplicate window occurrence.

    ``pos`` is the 1-based token index where the duplicated
    ``min_len``-token window starts. Tokenization is ``split(' ')`` —
    lossless (join(' ') restores the text exactly) and identical to
    DuckDB ``string_split(text, ' ')``, so the SQL oracle replays it.
    """
    from gridfia_ray.stages.dedup_util import bucket_of

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        keys: list[int] = []
        wins: list[str] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if _is_null_text(text):
                continue  # oracle semantics: NULL text -> no windows
            toks = text.split(" ")
            n = len(toks)
            if n < min_len:
                continue
            if n - min_len + 1 >= _POS_BASE:
                raise ValueError(
                    f"doc {doc_id}: {n} tokens overflows the packed "
                    f"(doc,pos) key base {_POS_BASE}"
                )
            base = int(doc_id) * _POS_BASE
            keys.extend(base + i for i in range(1, n - min_len + 2))
            wins.extend(
                " ".join(toks[i : i + min_len]) for i in range(n - min_len + 1)
            )
        return pd.DataFrame(
            {
                "h": _md5_64(wins),
                "key": np.asarray(keys, np.int64),
            }
        )

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, ["h"], n_buckets)
        return batch

    def mark(group: pd.DataFrame) -> pd.DataFrame:
        # canonical first occurrence per hash; everything else is a cut
        keep = group.groupby("h")["key"].transform("min")
        dup = group.loc[
            (group.groupby("h")["h"].transform("size") > 1)
            & (group["key"] != keep),
            "key",
        ].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": dup // _POS_BASE,
                "pos": dup % _POS_BASE,
            }
        )

    return (
        docs.map_batches(explode, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(mark, batch_format="pandas")
    )


def substr_dedup_docs(
    docs: rd.Dataset, min_len: int = 10, n_buckets: int = 64
) -> rd.Dataset:
    """Rewrite every document with its duplicate spans removed.

    Returns (doc_id, n_tokens, n_removed, text_clean): original token
    count, tokens cut (the union of the doc's duplicate-window
    intervals), and the surviving tokens re-joined in order (`''` when
    everything was duplicated). Docs with NULL text are dropped; docs
    shorter than ``min_len`` tokens pass through untouched.
    """
    from gridfia_ray.stages.dedup_util import bucket_of

    spans = substr_dup_spans(docs, min_len=min_len, n_buckets=n_buckets)

    def doc_side(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [
            i
            for i, t in enumerate(batch["text"])
            if not _is_null_text(t)
        ]
        b = batch.iloc[keep]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "pos": np.full(len(b), -1, np.int64),
                "text": b["text"].astype(str),
            }
        )

    def span_side(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "pos": batch["pos"].to_numpy(np.int64),
                "text": np.full(len(batch), "", object),
            }
        )

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__bucket"] = bucket_of(batch, ["doc_id"], n_buckets)
        return batch

    def rewrite(group: pd.DataFrame) -> pd.DataFrame:
        texts = group[group["pos"] < 0]
        cuts = group[group["pos"] >= 0]
        starts = {
            doc: g["pos"].to_numpy(np.int64)
            for doc, g in cuts.groupby("doc_id")
        }
        doc_ids, n_toks, n_rem, clean = [], [], [], []
        for doc_id, text in zip(texts["doc_id"], texts["text"]):
            toks = text.split(" ")
            n = len(toks)
            covered = np.zeros(n, bool)
            for p in starts.get(doc_id, ()):
                covered[p - 1 : p - 1 + min_len] = True
            doc_ids.append(doc_id)
            n_toks.append(n)
            n_rem.append(int(covered.sum()))
            clean.append(
                " ".join(t for t, c in zip(toks, covered) if not c)
            )
        return pd.DataFrame(
            {
                "doc_id": np.asarray(doc_ids, np.int64),
                "n_tokens": np.asarray(n_toks, np.int64),
                "n_removed": np.asarray(n_rem, np.int64),
                "text_clean": clean,
            }
        )

    both = docs.map_batches(doc_side, batch_format="pandas").union(
        spans.map_batches(span_side, batch_format="pandas")
    )
    return (
        both.map_batches(bucket, batch_format="pandas")
        .repartition(n_buckets)
        .groupby("__bucket")
        .map_groups(rewrite, batch_format="pandas")
    )
