"""BM25 document retrieval (Robertson–Spärck Jones / Okapi, the
Lucene-default scorer) — integer-exact variant over the same
three-scan shape as text/tfidf.py (whose query-vector and bounded-df
helpers it reuses).

Exactness contract: with k1 = 6/5 and b = 3/4 (the classic defaults as
exact rationals) and avgdl = Lnum/Lden (total corpus tokens over total
docs, an exact rational), the per-term length-normalized tf

    ntf = tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))

multiplies out to the integer ratio

    ntf_c = (44·tf·Lnum·1000) // (20·tf·Lnum + 6·Lnum + 18·len·Lden)

— one int64 floor division, no float in sight. idf quantizes to
integer milli-nats BEFORE any sum (``floor(1000·ln(1 + (N−df+0.5)/
(df+0.5)) + 0.5)``), so every score is ``Σ_t tf_q·idf_c·ntf_c`` — an
order-free int64 sum reproducible bit-for-bit by an ANSI-SQL oracle
doing the identical integer arithmetic.

int64 headroom: the division numerator needs ``44000·tf·Lnum < 2^63``
⇒ ``tf·Lnum ≲ 2·10^14`` (a 10-billion-token corpus with tf ≤ 20k).
The scorer checks and raises beyond it — at that scale quantize per
shard or accept float BM25; silent wraparound is never an option.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gridfia_ray.text.tfidf import _term_counts, _WS, query_term_vectors

K1_NUM, K1_DEN = 6, 5  # k1 = 1.2
B_NUM, B_DEN = 3, 4  # b = 0.75
_NTF_SCALE = 1000

# NUL-free sentinels on purpose: pandas' object-dtype groupby hashes
# strings as C strings (khash), so any two NUL-PREFIXED keys compare
# equal ("" before the terminator) and silently merge — two in-band
# "\x00..." sentinels here folded into one row and zeroed the corpus
# length. \x01 is outside \S+'s practical corpus alphabet and compares
# by its full bytes.
_DF_SENTINEL = "\x01__n_docs__"
_LEN_SENTINEL = "\x01__n_toks__"


def bm25_idf_milli(df: int, n_docs: int) -> int:
    """floor(1000·ln(1 + (N − df + 0.5)/(df + 0.5)) + 0.5) — the
    Lucene-style non-negative BM25 idf in integer milli-nats, half-up
    like every quantizer in this repo."""
    return int(
        math.floor(1000.0 * math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) + 0.5)
    )


def corpus_stats_for_vocab(
    docs: rd.Dataset, vocab: set[str], text_col: str = "text"
) -> tuple[dict[str, int], int, int]:
    """(df per vocab token, n_docs, total token count) in ONE corpus
    pass — text/tfidf.df_for_vocab plus the corpus length, both carried
    as in-band sentinel rows through the same bounded keyed sum."""
    from gridfia_ray.stages.agg_util import bucketed_agg

    if _DF_SENTINEL in vocab or _LEN_SENTINEL in vocab:
        raise ValueError("corpus_stats_for_vocab: vocabulary contains a reserved sentinel")

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        n_toks = 0
        texts = batch[text_col].to_pylist()
        for t in texts:
            toks = _WS.findall(t or "")
            n_toks += len(toks)
            c.update(set(toks) & vocab)
        keys = sorted(c)
        vals = [c[t] for t in keys]
        keys += [_DF_SENTINEL, _LEN_SENTINEL]
        vals += [len(texts), n_toks]
        return pa.table(
            {"tok": pa.array(keys, pa.string()), "df": pa.array(vals, pa.int64())}
        )

    agg = bucketed_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["tok"],
        {"df": ("df", "sum")},
        n_buckets=16,
    ).to_pandas()
    out = dict(zip(agg["tok"], agg["df"].astype(int)))
    n_docs = int(out.pop(_DF_SENTINEL, 0))
    lnum = int(out.pop(_LEN_SENTINEL, 0))
    return out, n_docs, lnum


class _Bm25Scorer:
    """Actor-pool scorer (same shape as tfidf._TfIdfScorer): per batch
    one sparse tf fill, one vectorized int64 ntf division, one integer
    matmul against the broadcast query-weight matrix, local top-k."""

    def __init__(self, vocab_tokens, qweights, query_ids, exclude_ids, k,
                 text_col, lnum, lden):
        self._col = {t: i for i, t in enumerate(vocab_tokens)}
        self._w = np.asarray(qweights, dtype=np.int64)  # (n_queries, V)
        self._qids = np.asarray(query_ids, dtype=np.int64)
        self._exclude = set(int(x) for x in exclude_ids)
        self._k = int(k)
        self._text_col = text_col
        self._lnum = int(lnum)
        self._lden = int(lden)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.array([i not in self._exclude for i in ids], dtype=bool)
        texts = batch[self._text_col].to_pylist()
        col = self._col
        n_kept = int(keep.sum())
        tf = np.zeros((n_kept, len(col)), dtype=np.int64)
        lens = np.zeros(n_kept, dtype=np.int64)
        kept_ids = ids[keep]
        r = 0
        for i, t in enumerate(texts):
            if not keep[i]:
                continue
            toks = _WS.findall(t or "")
            lens[r] = len(toks)
            cnts = _term_counts(t)
            for tok, n in cnts.items():
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
        lnum, lden = self._lnum, self._lden
        tf_max = int(tf.max()) if tf.size else 0
        if tf_max and 44 * _NTF_SCALE * tf_max * lnum >= (1 << 63):
            raise OverflowError(
                f"bm25: 44000·tf·Lnum exceeds int64 (tf={tf_max}, Lnum={lnum}) "
                "— the integer-exact quantization needs tf·Lnum < 2·10^14"
            )
        den = 20 * tf * lnum + 6 * lnum + 18 * lens[:, None] * lden
        ntf = (44 * _NTF_SCALE * tf * lnum) // den  # int64 floor division
        scores = ntf @ self._w.T  # (docs, queries) int64
        qcol, dcol, scol = [], [], []
        k = min(self._k, r)
        for q in range(self._w.shape[0]):
            s = scores[:, q]
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


def bm25_topk(
    docs: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    text_col: str = "text",
    concurrency: int = 4,
    query_docs: rd.Dataset | None = None,
) -> pd.DataFrame:
    """Top-k documents per query doc by integer-exact BM25 (score =
    Σ_t tf_q·idf_c·ntf_c, ties → ascending doc_id; query docs excluded;
    zero scores dropped). Same contract and scan structure as
    text/tfidf.tfidf_topk."""
    qvecs = query_term_vectors(
        docs if query_docs is None else query_docs, query_ids, text_col
    )
    vocab = sorted(set().union(*[set(c) for c in qvecs.values()]))
    dfreq, n_docs, lnum = corpus_stats_for_vocab(docs, set(vocab), text_col)
    if lnum == 0:
        raise ValueError("bm25: corpus has no tokens")
    idf = np.array(
        [bm25_idf_milli(dfreq.get(t, 0), n_docs) for t in vocab], np.int64
    )
    qids = sorted(qvecs)
    qw = np.zeros((len(qids), len(vocab)), dtype=np.int64)
    for qi, q in enumerate(qids):
        c = qvecs[q]
        for ti, t in enumerate(vocab):
            if t in c:
                qw[qi, ti] = c[t] * idf[ti]

    partials = docs.map_batches(
        _Bm25Scorer,
        fn_constructor_kwargs={
            "vocab_tokens": vocab,
            "qweights": qw,
            "query_ids": qids,
            "exclude_ids": qids,
            "k": k,
            "text_col": text_col,
            "lnum": lnum,
            "lden": n_docs,
        },
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
