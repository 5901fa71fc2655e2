"""Hybrid retrieval (ann/hybrid.py): quantizer convention, exact MIPS
top-k vs a brute-force numpy replay, tie-break and exclusion contracts,
RRF fusion arithmetic, partition invariance of the fused result."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.ann.hybrid import (
    Q_SCALE,
    RRF_SCALE,
    hybrid_topk,
    mips_topk_int,
    quantize_embeddings,
    rrf_fuse,
)


def _emb_ds(vecs, ids=None, parts=1):
    ids = list(range(len(vecs))) if ids is None else ids
    df = pd.DataFrame(
        {
            "vec_id": np.asarray(ids, np.int64),
            "embedding": [np.asarray(v, np.float32) for v in vecs],
        }
    )
    return rd.from_pandas(df).repartition(parts)


def _brute_mips(vecs, query_ids, k):
    """Sequential replay: quantize, dot, rank by (dot desc, id asc).
    Quantizes AFTER the float32 storage cast, like the real column."""
    q = quantize_embeddings(np.asarray(vecs, np.float32).astype(np.float64))
    rows = []
    for qid in sorted(query_ids):
        dots = [
            (int(q[i] @ q[qid]), i)
            for i in range(len(vecs))
            if i not in set(query_ids)
        ]
        dots.sort(key=lambda t: (-t[0], t[1]))
        for rank, (d, i) in enumerate(dots[:k], 1):
            rows.append((qid, i, d, rank))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "dot_c", "rank"])


class TestQuantize:
    def test_round_half_up(self):
        # floor(x·S + 0.5): ±0.5 ulp cases round toward +inf
        x = np.array([0.0, 1.0, -1.0, 0.5 / Q_SCALE, -0.5 / Q_SCALE])
        q = quantize_embeddings(x.reshape(1, -1))[0]
        assert q.tolist() == [0, Q_SCALE, -Q_SCALE, 1, 0]

    def test_float32_promotion_matches_duckdb(self):
        # the engine quantizes the float32 column after a float64
        # promotion — same as DuckDB's FLOAT * DOUBLE arithmetic
        duckdb = pytest.importorskip("duckdb")
        rng = np.random.default_rng(7)
        v = rng.normal(0, 0.3, 256).astype(np.float32)
        ours = quantize_embeddings(v.reshape(1, -1))[0]
        theirs = duckdb.sql(
            "SELECT CAST(FLOOR(x * 1048576.0 + 0.5) AS BIGINT) q "
            "FROM (SELECT unnest($v::FLOAT[]) x)",
            params={"v": v.tolist()},
        ).df()["q"]
        assert ours.tolist() == theirs.tolist()


class TestMips:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(42)
        vecs = rng.normal(0, 0.5, (80, 16))
        got = mips_topk_int(_emb_ds(vecs, parts=5), [3, 11], k=7)
        exp = _brute_mips(vecs, [3, 11], k=7)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_tie_break_ascending_id(self, ray_session):
        # identical vectors → identical dots → rank by vec_id asc
        base = np.ones(4)
        vecs = [base, base * 0.5, base, base, base * 0.1]
        out = mips_topk_int(_emb_ds(vecs, parts=2), [0], k=3)
        assert out["doc_id"].tolist() == [2, 3, 1]
        assert out["rank"].tolist() == [1, 2, 3]

    def test_query_excluded_and_missing_raises(self, ray_session):
        vecs = np.eye(4)
        out = mips_topk_int(_emb_ds(vecs), [1], k=10)
        assert 1 not in out["doc_id"].tolist()
        with pytest.raises(ValueError, match="query vectors"):
            mips_topk_int(_emb_ds(vecs), [99], k=2)

    def test_partition_invariance(self, ray_session):
        rng = np.random.default_rng(1)
        vecs = rng.normal(0, 1, (60, 8))
        a = mips_topk_int(_emb_ds(vecs, parts=1), [0, 7], k=5)
        b = mips_topk_int(_emb_ds(vecs, parts=13), [0, 7], k=5)
        pd.testing.assert_frame_equal(a, b)

    def test_overflow_guard(self, ray_session):
        vecs = np.full((4, 2100000), 1.9)  # dim beyond int64 headroom
        with pytest.raises(ValueError, match="overflow"):
            mips_topk_int(
                _emb_ds([[1.0]]), [0], k=1, queries=vecs
            )


class TestRrf:
    def test_fusion_arithmetic(self):
        lex = pd.DataFrame(
            {"query_id": [1, 1], "doc_id": [10, 20], "rank": [1, 2]}
        )
        vec = pd.DataFrame(
            {"query_id": [1, 1], "doc_id": [20, 30], "rank": [1, 2]}
        )
        out = rrf_fuse([lex, vec], k=10)
        exp = {
            10: RRF_SCALE // 61,
            20: RRF_SCALE // 62 + RRF_SCALE // 61,
            30: RRF_SCALE // 62,
        }
        got = dict(zip(out["doc_id"], out["rrf_c"]))
        assert got == exp

    def test_topk_tie_break(self):
        # equal fused scores → keep ascending doc_id
        t = pd.DataFrame(
            {"query_id": [5] * 3, "doc_id": [9, 2, 7], "rank": [1, 1, 1]}
        )
        out = rrf_fuse([t], k=2)
        assert out["doc_id"].tolist() == [2, 7]


class TestHybrid:
    def test_end_to_end_sf(self, ray_session, tmp_path):
        # tiny corpus where lexical and dense disagree: doc 1 shares
        # tokens with the query doc, doc 2 is its nearest vector
        texts = [
            "alpha beta gamma delta",
            "alpha beta other words here",
            "nothing in common at all",
            "beta gamma overlap text",
        ]
        vecs = np.array(
            [[1.0, 0.0], [0.0, 1.0], [0.99, 0.05], [0.0, -1.0]]
        )
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": texts})
        )
        out = hybrid_topk(docs, _emb_ds(vecs), [0], k=4, k_each=4)
        scores = dict(zip(out["doc_id"], out["rrf_c"]))
        # doc 2: rank 1 dense only; docs 1/3: lexical (+ dense tail)
        assert scores[2] >= RRF_SCALE // 61
        assert set(out["doc_id"]) <= {1, 2, 3}
        # every fused score is a sum of 10^6 // (60 + r) terms
        valid = {RRF_SCALE // (60 + r) for r in range(1, 5)}
        sums = valid | {a + b for a in valid for b in valid}
        assert set(scores.values()) <= sums
