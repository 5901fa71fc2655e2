"""TF-IDF document retrieval: score every corpus document against a
small set of query documents and return the top-k matches per query —
the classic sparse lexical retrieval the reference's tabular export
surface has no analogue for (SURVEY §2.9 text family; Sparck Jones
1972 / SMART ltc weighting, integer-exact variant).

Scale shape (why this distributes at 10^12 docs) — three corpus scans
(query-row extraction, document frequencies, scoring; pass pre-filtered
``query_docs`` to drop the first):

  * the QUERY side is tiny by contract (a handful of seed documents).
    Their term vectors come from a vectorized id-filtered scan (or the
    caller's own pushed-down read via ``query_docs``) and broadcast —
    never a join.
  * document frequencies are computed for QUERY-VOCAB TOKENS ONLY in
    one corpus pass: a per-batch presence Counter over the vocabulary
    intersection (plus the batch doc count) feeds a bucketed keyed
    sum whose result is bounded by the query vocabulary, not the
    corpus vocabulary. No global (token, df) table ever exists.
  * scoring is a second corpus pass: each block emits only its local
    top-k rows per query (a combiner), and one tiny exchange keyed on
    query_id merges block winners. Driver never folds corpus rows.

Exactness contract: idf is quantized to integer milli-nats
(``idf_c = round(1000·ln((N+1)/(df+1)) + 1000)``) and tf is the raw
term count, so every score is an int64 dot product —
bit-exact across partitionings, and reproducible by an ANSI-SQL
oracle that performs the identical integer arithmetic (ties broken
by ascending doc_id). int64 headroom: tf ≤ 10^4, idf_c ≤ ~3·10^4
⇒ per-term ≤ 10^17 only for pathological tf on both sides; the
scorer upcasts through float for the argsort but sums in int64.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_WS = re.compile(r"\S+")


def _term_counts(text: str) -> Counter:
    return Counter(_WS.findall(text or ""))


def query_term_vectors(
    docs: rd.Dataset, query_ids: list[int], text_col: str = "text"
) -> dict[int, Counter]:
    """Term vectors for the query documents — a filtered read of a
    handful of rows (columns pruned upstream by the caller)."""
    import pyarrow.compute as pc

    qset = set(int(q) for q in query_ids)
    want = pa.array(sorted(qset), pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(batch["doc_id"], pa.int64()), value_set=want)
        return batch.filter(m)

    rows = docs.map_batches(pick, batch_format="pyarrow").take_all()
    found = {int(r["doc_id"]): _term_counts(r[text_col]) for r in rows}
    missing = qset - set(found)
    if missing:
        raise ValueError(f"tfidf: query doc_ids not found: {sorted(missing)}")
    return found


def df_for_vocab(
    docs: rd.Dataset, vocab: set[str], text_col: str = "text"
) -> tuple[dict[str, int], int]:
    """(document frequency per vocab token, total doc count) in ONE
    corpus pass. The combiner emits at most ``len(vocab)+1`` rows per
    batch; the exchange result is bounded by the query vocabulary."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    _N_SENTINEL = "\x00__n_docs__"
    if _N_SENTINEL in vocab:
        # \S+ DOES match NUL, so a pathological corpus token could
        # collide with the in-band doc-count sentinel and silently
        # inflate n_docs while zeroing that token's df — refuse it
        raise ValueError("df_for_vocab: vocabulary contains the reserved sentinel")

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        texts = batch[text_col].to_pylist()
        for t in texts:
            seen = set(_WS.findall(t or "")) & vocab
            c.update(seen)
        toks = sorted(c)
        toks.append(_N_SENTINEL)
        cnts = [c[t] for t in toks[:-1]] + [len(texts)]
        return pa.table(
            {
                "tok": pa.array(toks, pa.string()),
                "df": pa.array(cnts, pa.int64()),
            }
        )

    agg = bucketed_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["tok"],
        {"df": ("df", "sum")},
        n_buckets=16,
    ).to_pandas()
    out = dict(zip(agg["tok"], agg["df"].astype(int)))
    n_docs = int(out.pop(_N_SENTINEL, 0))
    return out, n_docs


def idf_milli(df: int, n_docs: int) -> int:
    """Smoothed idf in integer milli-nats: floor(1000·ln((N+1)/(df+1))
    + 1000 + 0.5). Quantizing BEFORE any sum is what makes downstream
    scores order-free int64 arithmetic on both the Ray and SQL sides;
    floor(x+0.5) (not Python banker's round) is the repo-wide
    half-up convention shared verbatim with the oracles."""
    return int(math.floor(1000.0 * math.log((n_docs + 1.0) / (df + 1.0)) + 1000.5))


class _TfIdfScorer:
    """Actor-pool scorer: the (token → column) map, per-query weight
    matrix and squared-idf vector build once per actor; each batch does
    one sparse count fill + one integer matmul and emits its local
    top-k rows per query."""

    def __init__(self, vocab_tokens, qweights, query_ids, exclude_ids, k, text_col):
        self._col = {t: i for i, t in enumerate(vocab_tokens)}
        self._w = np.asarray(qweights, dtype=np.int64)  # (n_queries, V)
        self._qids = np.asarray(query_ids, dtype=np.int64)
        self._exclude = set(int(x) for x in exclude_ids)
        self._k = int(k)
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.array([i not in self._exclude for i in ids], dtype=bool)
        texts = batch[self._text_col].to_pylist()
        col = self._col
        tf = np.zeros((int(keep.sum()), len(col)), dtype=np.int64)
        kept_ids = ids[keep]
        r = 0
        for i, t in enumerate(texts):
            if not keep[i]:
                continue
            for tok, n in _term_counts(t).items():
                j = col.get(tok)
                if j is not None:
                    tf[r, j] = n
            r += 1
        if r == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score_c": pa.array([], pa.int64()),
                }
            )
        scores = tf @ self._w.T  # (docs, queries) int64
        qcol, dcol, scol = [], [], []
        k = min(self._k, r)
        for q in range(self._w.shape[0]):
            s = scores[:, q]
            # local top-k by (score desc, doc_id asc): lexsort on
            # (-score, doc_id) equivalent via stable argsort
            order = np.lexsort((kept_ids, -s))[:k]
            qcol.extend([int(self._qids[q])] * k)
            dcol.extend(kept_ids[order].tolist())
            scol.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(qcol, pa.int64()),
                "doc_id": pa.array(dcol, pa.int64()),
                "score_c": pa.array(scol, pa.int64()),
            }
        )


def tfidf_topk(
    docs: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    text_col: str = "text",
    concurrency: int = 4,
    query_docs: rd.Dataset | None = None,
) -> pd.DataFrame:
    """Top-k documents per query doc by integer tf-idf dot product
    (score = Σ_t tf_d·tf_q·idf_c², ties → ascending doc_id; query docs
    excluded from candidates). Returns (query_id, doc_id, score_c)
    sorted by (query_id, doc_id); zero-score rows are dropped (no
    shared vocabulary ⇒ not a match). ``query_docs`` (a pre-filtered
    dataset containing just the query rows, e.g. from a predicate-
    pushdown read) skips the query-extraction scan of the corpus."""
    qvecs = query_term_vectors(
        docs if query_docs is None else query_docs, query_ids, text_col
    )
    vocab = sorted(set().union(*[set(c) for c in qvecs.values()]))
    dfreq, n_docs = df_for_vocab(docs, set(vocab), text_col)
    idf = np.array([idf_milli(dfreq.get(t, 0), n_docs) for t in vocab], np.int64)
    qids = sorted(qvecs)
    # per-query weight includes BOTH idf factors: w_q[t] = tf_q · idf²,
    # so the per-doc side contributes raw tf only (one int matmul)
    qw = np.zeros((len(qids), len(vocab)), dtype=np.int64)
    for qi, q in enumerate(qids):
        c = qvecs[q]
        for ti, t in enumerate(vocab):
            if t in c:
                qw[qi, ti] = c[t] * idf[ti] * idf[ti]

    partials = docs.map_batches(
        _TfIdfScorer,
        fn_constructor_kwargs={
            "vocab_tokens": vocab,
            "qweights": qw,
            "query_ids": qids,
            "exclude_ids": qids,
            "k": k,
            "text_col": text_col,
        },
        # autoscaling pool (min 1): a FIXED pool sized to the whole
        # cluster pins every CPU to long-lived actors and starves the
        # downstream exchange on small clusters (deadlock at 4 CPUs)
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["score_c", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g[g["score_c"] > 0]

    out = (
        partials.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype(
        {"query_id": np.int64, "doc_id": np.int64, "score_c": np.int64}
    )
    return out.sort_values(["query_id", "doc_id"], ignore_index=True)
