"""DuckDB oracle SQL, part B — split out of build_oracle_sql (round-5
VERDICT #3). Statements preserved verbatim in original order; the
preamble locals are recomputed per part."""

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


def add_oracles_b(sql: dict, f: dict) -> None:
    from gridfia_ray.pipelines.sampling import rate_threshold_hex as _rth  # noqa: F401
    P = f["pixels"]
    PZ = f["pixel_zones"]
    TD = f["tiles_dup"]
    T = f["tiles"]
    t = f["meta"]["tile"]
    x0, px, _, y0, _, nyp = f["meta"]["transform"]

    species_cte = f"WITH p AS (SELECT * FROM read_parquet('{P}') WHERE species_code <> '0000')"
    tot_cte = "tot AS (SELECT y, x, SUM(biomass) total FROM p GROUP BY y, x)"

    sql["gf_store_validate"] = f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT split_part(image_id, '/', 1)) AS n_species,
               CAST(SUM(CAST(w AS BIGINT) * CAST(h AS BIGINT)) AS BIGINT) AS n_pixels
        FROM read_parquet('{T}/*.parquet')"""

    # documents / embeddings / events / relational (driver views)
    sql["doc_dedup_exact"] = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"
    sql["doc_decontaminate"] = """
        WITH snip AS (
          SELECT DISTINCT substr(text, 21, 48) AS s FROM documents
          WHERE doc_id % 97 = 0 AND length(text) >= 68
        )
        SELECT d.doc_id, count(*) AS n_hits
        FROM documents d JOIN snip ON contains(d.text, snip.s)
        GROUP BY d.doc_id"""
    # thresholds = split_thresholds_hex({train:.8, val:.1, test:.1});
    # lexicographic compare of fixed-width lowercase hex == numeric compare
    sql["doc_split"] = """
        SELECT doc_id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
                      THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
                      THEN 'val'
                    ELSE 'test' END AS split
        FROM documents"""
    sql["doc_filter_chain"] = sql["doc_corpus_build"] = """
        WITH snip AS (
          SELECT DISTINCT substr(text, 21, 48) AS s FROM documents
          WHERE doc_id % 97 = 0 AND length(text) >= 68
        ),
        winners AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        q AS (SELECT doc_id, text,
                     len(regexp_extract_all(text, '\\S+')) AS n_tokens,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                     length(text) AS n_chars
              FROM documents)
        SELECT q.doc_id
        FROM q JOIN winners USING (doc_id)
        WHERE n_tokens BETWEEN 20 AND 1000 AND 2 * n_alpha >= n_chars
          AND NOT EXISTS (SELECT 1 FROM snip WHERE contains(q.text, snip.s))"""
    sql["doc_decontaminate_ngram"] = """
        WITH snip AS (
          SELECT DISTINCT substr(text, 21, 48) AS s FROM documents
          WHERE doc_id % 97 = 0 AND length(text) >= 68
        ),
        sw AS (SELECT regexp_extract_all(lower(s), '\\S+') AS w FROM snip),
        sg AS (
          SELECT DISTINCT array_to_string(w[i : least(i + 7, len(w))], ' ') AS g
          FROM sw, UNNEST(generate_series(1, greatest(len(w) - 7, 1))) AS t(i)
          WHERE len(w) >= 1
        ),
        dw AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w
               FROM documents),
        dg AS (
          SELECT DISTINCT doc_id,
                 array_to_string(w[i : least(i + 7, len(w))], ' ') AS g
          FROM dw, UNNEST(generate_series(1, greatest(len(w) - 7, 1))) AS t(i)
          WHERE len(w) >= 1
        )
        SELECT dg.doc_id,
               count(sg.g) AS n_hits,
               count(*) AS n_ngrams
        FROM dg LEFT JOIN sg ON dg.g = sg.g
        GROUP BY dg.doc_id"""
    sql["doc_token_count"] = r"""
        SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        FROM documents"""
    # greedy packing replayed as a recursive CTE: each iteration advances
    # every shard by one document, carrying (seq, fill, pos)
    sql["doc_pack"] = r"""
        WITH RECURSIVE tok AS (
          SELECT doc_id, doc_id % 8 AS shard,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                      AS BIGINT) AS n_tokens
          FROM documents),
        o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) rn
              FROM tok),
        p AS (
          SELECT shard, doc_id, n_tokens, rn,
                 CAST(0 AS BIGINT) AS seq, n_tokens AS fill,
                 CAST(0 AS BIGINT) AS pos
          FROM o WHERE rn = 1
          UNION ALL
          SELECT o.shard, o.doc_id, o.n_tokens, o.rn,
                 CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 256
                      THEN p.seq + 1 ELSE p.seq END,
                 CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 256
                      THEN o.n_tokens ELSE p.fill + o.n_tokens END,
                 CASE WHEN p.fill > 0 AND p.fill + o.n_tokens > 256
                      THEN 0 ELSE p.pos + 1 END
          FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1
        )
        SELECT doc_id, CAST(shard AS BIGINT) AS shard,
               CAST(shard * 1099511627776 + seq AS BIGINT) AS seq_id,
               pos AS seq_pos, n_tokens
        FROM p ORDER BY doc_id"""
    sql["doc_bpe_tokens"] = r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s')) AS BIGINT) AS n_bpe_tokens
        FROM documents"""
    sql["doc_chunks"] = r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
                   FROM documents),
        c AS (SELECT doc_id,
                     CAST((s.i - 1) / 112 AS BIGINT) AS chunk_idx,
                     CAST(least(s.i + 127, len(w)) - s.i + 1 AS BIGINT)
                       AS n_tokens,
                     array_to_string(w[s.i : least(s.i + 127, len(w))], ' ')
                       AS chunk
              -- starts stop at len - overlap: no fully-redundant
              -- trailing window (same rule as chunk_documents)
              FROM t, UNNEST(generate_series(1, greatest(len(w) - 16, 1), 112)) AS s(i)
              WHERE len(w) >= 1)
        SELECT doc_id, chunk_idx, n_tokens, chunk FROM c"""
    sql["doc_heavy_tokens"] = r"""
        WITH t AS (SELECT unnest(regexp_extract_all(text, '\S+')) tok
                   FROM documents)
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY tok HAVING count(*) >= 800"""
    sql["doc_token_freq"] = r"""
        WITH t AS (SELECT unnest(CASE WHEN trim(text) = '' THEN []
                     ELSE regexp_split_to_array(trim(text), '\s+') END) tok
                   FROM documents),
        c AS (SELECT tok, COUNT(*) n FROM t GROUP BY tok)
        SELECT tok, CAST(n AS BIGINT) AS n FROM c
        ORDER BY n DESC, tok LIMIT 50"""
    sql["doc_top_tokens_by_source"] = r"""
        WITH t AS (SELECT source,
                     unnest(CASE WHEN trim(text) = '' THEN []
                       ELSE regexp_split_to_array(trim(text), '\s+') END) tok
                   FROM documents),
        c AS (SELECT source, tok, COUNT(*) n FROM t GROUP BY source, tok),
        r AS (SELECT source, tok, n,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n DESC, tok) rn
              FROM c)
        SELECT source, tok, CAST(n AS BIGINT) AS n
        FROM r WHERE rn <= 5
        ORDER BY source, n DESC, tok"""
    sql["doc_lm_perplexity"] = r"""
        WITH toks AS (SELECT doc_id, lang,
                             regexp_split_to_array(trim(text), '\s+') L
                      FROM documents WHERE trim(COALESCE(text, '')) <> ''),
        bg AS (SELECT doc_id, lang, L[i] a, L[i + 1] b
               FROM toks, UNNEST(generate_series(1, len(L) - 1)) AS t(i)
               WHERE len(L) >= 2),
        ref AS (SELECT a, b FROM bg WHERE lang = 'en'),
        big AS (SELECT a, b, COUNT(*) c_ab FROM ref GROUP BY 1, 2),
        ctx AS (SELECT a, COUNT(*) n_ctx FROM ref GROUP BY 1),
        vocab AS (SELECT COUNT(DISTINCT tok) v
                  FROM (SELECT unnest(L) tok FROM toks WHERE lang = 'en')),
        sc AS (SELECT bg.doc_id,
                      CAST(FLOOR(1e6 * LN((COALESCE(big.c_ab, 0) + 1.0)
                                          / (COALESCE(ctx.n_ctx, 0) + v))
                                 + 0.5) AS BIGINT) lp_c
               FROM bg LEFT JOIN big USING (a, b)
                       LEFT JOIN ctx USING (a), vocab)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_bigrams,
               CAST(SUM(lp_c) AS BIGINT) lp_sum_c
        FROM sc GROUP BY 1 ORDER BY doc_id"""
    sql["doc_nb_classifier"] = r"""
        WITH toks AS (SELECT doc_id, lang,
                             unnest(regexp_split_to_array(trim(text), '\s+')) tok
                      FROM documents WHERE trim(COALESCE(text, '')) <> ''),
        cnt AS (SELECT lang c, tok, COUNT(*) n FROM toks GROUP BY 1, 2),
        tc AS (SELECT lang c, COUNT(*) t FROM toks GROUP BY 1),
        nc AS (SELECT lang c, COUNT(DISTINCT doc_id) nd FROM toks GROUP BY 1),
        na AS (SELECT COUNT(DISTINCT doc_id) n_all FROM toks),
        vv AS (SELECT COUNT(DISTINCT tok) v FROM toks),
        dt AS (SELECT doc_id, tok, COUNT(*) k FROM toks GROUP BY 1, 2),
        body AS (SELECT dt.doc_id, tc.c,
                        CAST(SUM(dt.k * CAST(FLOOR(1e6 * LN((COALESCE(cnt.n, 0) + 1.0)
                                                            / (tc.t + vv.v))
                                                   + 0.5) AS BIGINT)) AS BIGINT) s
                 FROM dt CROSS JOIN tc CROSS JOIN vv
                 LEFT JOIN cnt ON cnt.c = tc.c AND cnt.tok = dt.tok
                 GROUP BY 1, 2),
        tot AS (SELECT body.doc_id, body.c,
                       body.s + CAST(FLOOR(1e6 * LN(nc.nd * 1.0 / na.n_all)
                                           + 0.5) AS BIGINT) score_c
                FROM body JOIN nc ON nc.c = body.c CROSS JOIN na),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY score_c DESC, c) rn
               FROM tot)
        SELECT doc_id, c AS pred, CAST(score_c AS BIGINT) AS score_c
        FROM rk WHERE rn = 1 ORDER BY doc_id"""
    sql["doc_winnow"] = f"""
        WITH hs AS (
          SELECT doc_id, i AS pos, md5(substr(text, i, {_WINNOW_K})) AS h
          FROM documents,
               UNNEST(generate_series(1, len(text) - {_WINNOW_K} + 1)) AS t(i)
          WHERE len(text) >= {_WINNOW_K}),
        mp AS (SELECT doc_id, MAX(pos) AS m FROM hs GROUP BY 1),
        wins AS (SELECT hs.doc_id, hs.pos AS s
                 FROM hs JOIN mp USING (doc_id)
                 WHERE hs.pos <= GREATEST(mp.m - {_WINNOW_W - 1}, 1)),
        wmin AS (SELECT w.doc_id, w.s, MIN(h.h) AS mn
                 FROM wins w JOIN hs h
                   ON h.doc_id = w.doc_id
                  AND h.pos BETWEEN w.s AND w.s + {_WINNOW_W - 1}
                 GROUP BY 1, 2),
        sel AS (SELECT wm.doc_id, MAX(h.pos) AS pos, wm.mn AS h
                FROM wmin wm JOIN hs h
                  ON h.doc_id = wm.doc_id
                 AND h.pos BETWEEN wm.s AND wm.s + {_WINNOW_W - 1}
                 AND h.h = wm.mn
                GROUP BY wm.doc_id, wm.s, wm.mn)
        SELECT DISTINCT doc_id, pos, h FROM sel ORDER BY doc_id, pos"""
    sql["doc_chi2_keywords"] = r"""
        WITH tk AS (SELECT DISTINCT doc_id, source,
                           unnest(regexp_split_to_array(trim(text), '\s+')) tok
                    FROM documents WHERE trim(COALESCE(text, '')) <> ''),
        a_t AS (SELECT source AS label, tok, CAST(COUNT(*) AS BIGINT) a
               FROM tk GROUP BY 1, 2),
        dft AS (SELECT tok, CAST(COUNT(*) AS BIGINT) dfv FROM tk GROUP BY 1),
        nc AS (SELECT source AS label, CAST(COUNT(DISTINCT doc_id) AS BIGINT) n
               FROM tk GROUP BY 1),
        na AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) n FROM tk),
        cells AS (SELECT a_t.label, a_t.tok, a_t.a,
                         dft.dfv - a_t.a AS b,
                         nc.n - a_t.a AS c2,
                         (na.n - nc.n) - (dft.dfv - a_t.a) AS d,
                         na.n AS n_all
                  FROM a_t JOIN dft USING (tok) JOIN nc USING (label)
                  CROSS JOIN na),
        sc AS (SELECT label, tok, a,
                      CASE WHEN CAST((a + b) * (c2 + d) AS DOUBLE)
                                * CAST((a + c2) * (b + d) AS DOUBLE) > 0
                           THEN CAST(FLOOR(
                             (CAST(n_all AS DOUBLE)
                              * (CAST(a * d - b * c2 AS DOUBLE)
                                 * CAST(a * d - b * c2 AS DOUBLE)))
                             / (CAST((a + b) * (c2 + d) AS DOUBLE)
                                * CAST((a + c2) * (b + d) AS DOUBLE))
                             * 1e6 + 0.5) AS BIGINT)
                           ELSE 0 END chi2_u
               FROM cells),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                            ORDER BY chi2_u DESC, tok) rank
               FROM sc)
        SELECT label, tok, CAST(rank AS BIGINT) rank, a, chi2_u
        FROM rk WHERE rank <= 10 ORDER BY label, rank"""
    sql["doc_dsir_weights"] = r"""
        WITH tk AS (SELECT doc_id, lang,
                           substr(md5(unnest(regexp_split_to_array(trim(text),
                                                                   '\s+'))),
                                  1, 3) b
                    FROM documents WHERE trim(COALESCE(text, '')) <> ''),
        raw AS (SELECT b, COUNT(*) n FROM tk GROUP BY 1),
        tgt AS (SELECT b, COUNT(*) n FROM tk WHERE lang = 'en' GROUP BY 1),
        trw AS (SELECT COUNT(*) t FROM tk),
        ttg AS (SELECT COUNT(*) t FROM tk WHERE lang = 'en'),
        db AS (SELECT doc_id, b, COUNT(*) k FROM tk GROUP BY 1, 2)
        SELECT db.doc_id,
               CAST(SUM(db.k) AS BIGINT) n_toks,
               CAST(SUM(db.k * (
                   CAST(FLOOR(1e6 * LN((COALESCE(tg.n, 0) + 1.0)
                                       / (ttg.t + 4096)) + 0.5) AS BIGINT)
                 - CAST(FLOOR(1e6 * LN((rw.n + 1.0)
                                       / (trw.t + 4096)) + 0.5) AS BIGINT)
               )) AS BIGINT) w_c
        FROM db CROSS JOIN trw CROSS JOIN ttg
        JOIN raw rw USING (b) LEFT JOIN tgt tg USING (b)
        GROUP BY 1 ORDER BY 1"""
    _tq = ", ".join(str(q) for q in _TFIDF_QUERY_IDS)
    sql["doc_tfidf_topk"] = rf"""
        WITH toks AS (
          SELECT doc_id, unnest(CASE WHEN trim(COALESCE(text, '')) = '' THEN []
                 ELSE regexp_split_to_array(trim(text), '\s+') END) tok
          FROM documents),
        qtf AS (SELECT doc_id qid, tok, COUNT(*) tf_q FROM toks
                WHERE doc_id IN ({_tq}) GROUP BY 1, 2),
        vocab AS (SELECT DISTINCT tok FROM qtf),
        dfv AS (SELECT tok, COUNT(DISTINCT doc_id) dfc FROM toks
                WHERE tok IN (SELECT tok FROM vocab) GROUP BY 1),
        n AS (SELECT COUNT(*) n_docs FROM documents),
        idf AS (SELECT tok,
                       CAST(FLOOR(1000.0 * LN((n_docs + 1.0) / (dfc + 1.0))
                                  + 1000.5) AS BIGINT) idf_c
                FROM dfv, n),
        dtf AS (SELECT doc_id, tok, COUNT(*) tf_d FROM toks
                WHERE tok IN (SELECT tok FROM vocab)
                  AND doc_id NOT IN ({_tq}) GROUP BY 1, 2),
        sc AS (SELECT q.qid query_id, d.doc_id,
                      CAST(SUM(d.tf_d * q.tf_q * i.idf_c * i.idf_c) AS BIGINT) score_c
               FROM dtf d JOIN qtf q USING (tok) JOIN idf i USING (tok)
               GROUP BY 1, 2),
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY score_c DESC, doc_id) rn
               FROM sc)
        SELECT query_id, doc_id, score_c FROM rk
        WHERE rn <= 10 AND score_c > 0 ORDER BY query_id, doc_id"""
    # same CTE skeleton as tfidf; '//' is DuckDB's BIGINT floor
    # division — the whole score path stays in integer arithmetic.
    # The skeleton (…→ sc = integer BM25 scores) is shared by the pure
    # BM25 oracle and the hybrid-RRF oracle below.
    _bm25_ctes = rf"""
        WITH toks AS (
          SELECT doc_id, unnest(CASE WHEN trim(COALESCE(text, '')) = '' THEN []
                 ELSE regexp_split_to_array(trim(text), '\s+') END) tok
          FROM documents),
        qtf AS (SELECT doc_id qid, tok, COUNT(*) tf_q FROM toks
                WHERE doc_id IN ({_tq}) GROUP BY 1, 2),
        vocab AS (SELECT DISTINCT tok FROM qtf),
        dfv AS (SELECT tok, COUNT(DISTINCT doc_id) dfc FROM toks
                WHERE tok IN (SELECT tok FROM vocab) GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) n_docs FROM documents),
        corp AS (SELECT CAST(COUNT(*) AS BIGINT) lnum FROM toks),
        idf AS (SELECT tok,
                       CAST(FLOOR(1000.0 * LN(1.0 + (n_docs - dfc + 0.5)
                                              / (dfc + 0.5)) + 0.5) AS BIGINT) idf_c
                FROM dfv, n),
        lens AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) dlen FROM toks GROUP BY 1),
        dtf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) tf_d FROM toks
                WHERE tok IN (SELECT tok FROM vocab)
                  AND doc_id NOT IN ({_tq}) GROUP BY 1, 2),
        ntf AS (SELECT d.doc_id, d.tok,
                       (44 * 1000 * d.tf_d * corp.lnum)
                       // (20 * d.tf_d * corp.lnum + 6 * corp.lnum
                           + 18 * l.dlen * n.n_docs) AS ntf_c
                FROM dtf d JOIN lens l USING (doc_id), corp, n),
        sc AS (SELECT q.qid query_id, nt.doc_id,
                      CAST(SUM(q.tf_q * i.idf_c * nt.ntf_c) AS BIGINT) score_c
               FROM ntf nt JOIN qtf q USING (tok) JOIN idf i USING (tok)
               GROUP BY 1, 2)"""
    sql["doc_bm25_topk"] = rf"""{_bm25_ctes},
        rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY score_c DESC, doc_id) rn
               FROM sc)
        SELECT query_id, doc_id, score_c FROM rk
        WHERE rn <= 10 AND score_c > 0 ORDER BY query_id, doc_id"""
    # hybrid RRF: BM25 ranks (the shared skeleton) + quantized-MIPS
    # ranks (floor(v·2^20+0.5) int64 dots — DuckDB's 1-based list index
    # over unnest(range(...)) pairs dimensions), fused with the same
    # 10^6 // (60 + rank) integer contribution as ann/hybrid.rrf_fuse
    sql["doc_hybrid_rrf"] = rf"""{_bm25_ctes},
        lex AS (SELECT query_id, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY score_c DESC, doc_id) rn
                FROM sc WHERE score_c > 0 QUALIFY rn <= 20),
        eq AS (SELECT vec_id qid, i,
                      CAST(FLOOR(embedding[i] * 1048576.0 + 0.5) AS BIGINT) qv
               FROM embeddings,
                    LATERAL (SELECT unnest(range(1, len(embedding)+1)) i) _
               WHERE vec_id IN ({_tq})),
        ed AS (SELECT vec_id, i,
                      CAST(FLOOR(embedding[i] * 1048576.0 + 0.5) AS BIGINT) dv
               FROM embeddings,
                    LATERAL (SELECT unnest(range(1, len(embedding)+1)) i) _
               WHERE vec_id NOT IN ({_tq})),
        dots AS (SELECT eq.qid query_id, ed.vec_id doc_id, SUM(eq.qv * ed.dv) dot
                 FROM eq JOIN ed USING (i) GROUP BY 1, 2),
        vec AS (SELECT query_id, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY dot DESC, doc_id) rn
                FROM dots QUALIFY rn <= 20),
        fused AS (SELECT COALESCE(l.query_id, v.query_id) query_id,
                         COALESCE(l.doc_id, v.doc_id) doc_id,
                         COALESCE(1000000 // (60 + l.rn), 0)
                         + COALESCE(1000000 // (60 + v.rn), 0) AS rrf_c
                  FROM lex l FULL OUTER JOIN vec v
                    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
        frk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY rrf_c DESC, doc_id) rn
                FROM fused)
        SELECT query_id, doc_id, CAST(rrf_c AS BIGINT) rrf_c FROM frk
        WHERE rn <= 10 ORDER BY query_id, doc_id"""
    # NULL discipline: engine hashes fillna('') → COALESCE here, and
    # NOT EXISTS (a NULL inside NOT IN poisons the whole predicate)
    sql["doc_dedup_incremental"] = """
        WITH f AS (SELECT DISTINCT md5(COALESCE(text, '')) h
                   FROM documents WHERE doc_id < 250),
        s AS (SELECT doc_id, md5(COALESCE(text, '')) h
              FROM documents WHERE doc_id >= 250),
        k AS (SELECT h, MIN(doc_id) keep FROM s
              WHERE NOT EXISTS (SELECT 1 FROM f WHERE f.h = s.h) GROUP BY h)
        SELECT keep AS doc_id FROM k"""
    sql["doc_para_dedup"] = """
        WITH s AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) ps FROM documents),
        p AS (SELECT doc_id, i AS idx, ps[i] AS para
              FROM s, LATERAL (SELECT unnest(range(1, len(ps)+1)) i) _),
        k AS (SELECT md5(para) h, MIN(doc_id*1000000 + idx) keep_key, COUNT(*) c
              FROM p GROUP BY 1),
        f AS (SELECT p.doc_id, p.idx, p.para FROM p JOIN k ON md5(p.para) = k.h
              WHERE k.c = 1 OR p.doc_id*1000000 + p.idx = k.keep_key)
        SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY idx) AS text_clean
        FROM f GROUP BY doc_id"""
    # doc_substr_dedup: the ExactSubstr window replay — same md5 window
    # keying, same MIN(doc*1e6+pos) canonical-first rule, same interval
    # union, entirely in SQL (text/substr.py semantics, L = 10)
    _SL = _SUBSTR_LEN
    sql["doc_substr_dedup"] = f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                   FROM documents WHERE text IS NOT NULL),
        tok AS (SELECT doc_id, i AS idx, toks[i] AS tok
                FROM t, LATERAL (SELECT unnest(range(1, len(toks)+1)) i) _),
        win AS (SELECT doc_id, i AS pos,
                       md5(array_to_string(toks[i:i+{_SL - 1}], ' ')) h
                FROM t, LATERAL (SELECT unnest(range(1, len(toks)-{_SL}+2)) i) _
                WHERE len(toks) >= {_SL}),
        k AS (SELECT h, MIN(doc_id*1000000 + pos) keep_key, COUNT(*) c
              FROM win GROUP BY 1),
        dup AS (SELECT w.doc_id, w.pos FROM win w JOIN k USING (h)
                WHERE k.c > 1 AND w.doc_id*1000000 + w.pos <> k.keep_key),
        cov AS (SELECT DISTINCT doc_id, idx FROM
                (SELECT doc_id, unnest(range(pos, pos+{_SL})) idx FROM dup))
        SELECT tok.doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(COUNT(cov.idx) AS BIGINT) AS n_removed,
          COALESCE(string_agg(CASE WHEN cov.idx IS NULL THEN tok.tok END,
                              ' ' ORDER BY tok.idx), '') AS text_clean
        FROM tok LEFT JOIN cov
          ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
        GROUP BY tok.doc_id"""
    sql["doc_quality"] = r"""
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
          CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
        FROM documents"""
    sql["doc_outlier_mad"] = """
        WITH med AS (
          SELECT source, quantile_disc(n_chars, 0.5) AS m
          FROM documents GROUP BY source),
        dev AS (
          SELECT d.doc_id, d.source, d.n_chars, ABS(d.n_chars - med.m) AS a
          FROM documents d JOIN med USING (source)),
        mad AS (SELECT source, quantile_disc(a, 0.5) AS s FROM dev GROUP BY source)
        SELECT dev.doc_id, dev.source, dev.n_chars
        FROM dev JOIN mad USING (source)
        WHERE dev.a > 3 * mad.s
        ORDER BY dev.doc_id"""
    sql["doc_repetition"] = r"""
        WITH l AS (SELECT doc_id, string_split(text, chr(10)) lines FROM documents),
        t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []
                                  ELSE regexp_split_to_array(trim(text), '\s+') END toks
              FROM documents),
        bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] g
               FROM t, LATERAL (SELECT unnest(range(1, len(toks))) i) _
               WHERE len(toks) >= 2),
        top AS (SELECT doc_id, MAX(c) top2 FROM
                  (SELECT doc_id, g, COUNT(*) c FROM bg GROUP BY 1, 2) GROUP BY 1)
        SELECT d.doc_id,
          CAST(len(l.lines) AS BIGINT) n_lines,
          CAST(len(l.lines) - len(list_distinct(l.lines)) AS BIGINT) n_dup_lines,
          CAST(GREATEST(len(t.toks) - 1, 0) AS BIGINT) n_2grams,
          CAST(COALESCE(top.top2, 0) AS BIGINT) top2gram_count
        FROM documents d JOIN l USING (doc_id) JOIN t USING (doc_id)
        LEFT JOIN top USING (doc_id)"""

    # doc_fingerprint: the same Horner rolling hash evaluated in SQL
    # (HUGEINT arithmetic; exact because the synthetic corpus is ASCII,
    # where utf-8 bytes == code points — verified at generation)
    _M61 = "2305843009213693951"
    sql["doc_fingerprint"] = rf"""
        SELECT doc_id,
          CASE WHEN trim(text) = '' THEN 0 ELSE
          CAST(list_reduce(
            list_prepend(CAST(0 AS HUGEINT),
              list_transform(regexp_split_to_array(trim(text), '\s+'),
                tok -> list_reduce(
                    list_prepend(CAST(0 AS HUGEINT),
                      list_transform(range(1, len(tok) + 1),
                                     i -> CAST(unicode(tok[i]) AS HUGEINT))),
                    (acc, ch) -> (acc * 131 + ch) % {_M61}) + 1)),
            (h, th) -> (h * 1000003 + th) % {_M61}) AS BIGINT) END AS fingerprint
        FROM documents"""

    # doc_langid: stopword-profile scores with the exact first-wins tie
    # rule of text/ops.LangId; stopword lists are generated from the
    # SAME dict so the two sides cannot drift
    from gridfia_ray.text.ops import _LANG_STOPWORDS

    def _score(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"

    # ONE tie-rule ladder shared by doc_langid and doc_fertility — a
    # LangId rule change cannot desynchronize the two oracles
    _LANG_CASE = """CASE
          WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
          WHEN s_de > 0 AND s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
          WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_de AND s_fr >= s_es THEN 'fr'
          WHEN s_es > 0 AND s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
          ELSE 'und' END"""
    sql["doc_langid"] = rf"""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') toks
                   FROM documents),
        s AS (SELECT doc_id, {_score('en')} s_en, {_score('de')} s_de,
                     {_score('fr')} s_fr, {_score('es')} s_es FROM t)
        SELECT doc_id, {_LANG_CASE} AS lang_pred
        FROM s"""
    sql["doc_fertility"] = rf"""
        WITH t AS (SELECT doc_id, text,
                          regexp_extract_all(lower(text), '[a-z]+') toks
                   FROM documents),
        s AS (SELECT doc_id, text, {_score('en')} s_en, {_score('de')} s_de,
                     {_score('fr')} s_fr, {_score('es')} s_es FROM t),
        lang AS (SELECT doc_id, text, {_LANG_CASE} AS lang_pred FROM s),
        cnt AS (SELECT lang_pred,
          CAST(CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+'))
               END AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(text,
               ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s')) AS BIGINT)
            AS n_bpe
          FROM lang),
        g AS (SELECT lang_pred, CAST(SUM(n_words) AS BIGINT) AS n_words,
                     CAST(SUM(n_bpe) AS BIGINT) AS n_bpe
              FROM cnt GROUP BY lang_pred)
        SELECT lang_pred, n_words, n_bpe,
               CASE WHEN n_words = 0 THEN CAST(-1 AS BIGINT)
                    ELSE CAST(FLOOR(CAST(n_bpe AS DOUBLE)
                              / CAST(n_words AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT) END AS fertility_u
        FROM g ORDER BY lang_pred"""

    # doc_near_dedup_incremental: the SQL side recomputes the 64-bit
    # SimHash from scratch — token Horner base-131 mod 2^64 + the
    # splitmix avalanche (text/hashing.py:41-49,141-163) in exact
    # HUGEINT arithmetic (mulmod via 32-bit split so int128 never
    # overflows; logical shifts as division on non-negative values;
    # xor through two's-complement BIGINT), then per-bit majority votes.
    # Code points stand in for UTF-8 bytes exactly as in the
    # doc_fingerprint oracle (identical on the ASCII corpus).
    _U64 = 1 << 64

    def _i64(e: str) -> str:
        return (
            f"CAST(CASE WHEN ({e}) >= 9223372036854775808 THEN ({e}) - {_U64} "
            f"ELSE ({e}) END AS BIGINT)"
        )

    def _xor64(a: str, b: str) -> str:
        x = f"xor({_i64(a)}, {_i64(b)})"
        return (
            f"(CASE WHEN ({x}) < 0 THEN CAST(({x}) AS HUGEINT) + {_U64} "
            f"ELSE CAST(({x}) AS HUGEINT) END)"
        )

    def _mulmod64(e: str, c: int) -> str:
        return (
            f"(((({e}) % 4294967296) * {c} "
            f"+ (((({e}) // 4294967296) * {c}) % 4294967296) * 4294967296) % {_U64})"
        )

    def _simhash_ctes(src: str) -> str:
        p2 = 0xC2B2AE3D27D4EB4F
        p3 = 0x165667B19E3779F9
        return rf"""
        {src}_tok AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM {src}),
        {src}_h0 AS (
          SELECT doc_id,
            list_reduce(
              list_transform(range(1, length(tok) + 1),
                             i -> CAST(unicode(tok[i]) AS HUGEINT)),
              (acc, ch) -> (acc * 131 + ch) % {_U64}) AS h0
          FROM {src}_tok),
        {src}_a1 AS (SELECT doc_id, {_xor64('h0', 'h0 // 8589934592')} AS x1 FROM {src}_h0),
        {src}_a2 AS (SELECT doc_id, {_mulmod64('x1', p2)} AS x2 FROM {src}_a1),
        {src}_a3 AS (SELECT doc_id, {_xor64('x2', 'x2 // 536870912')} AS x3 FROM {src}_a2),
        {src}_a4 AS (SELECT doc_id, {_mulmod64('x3', p3)} AS x4 FROM {src}_a3),
        {src}_th AS (SELECT doc_id, {_xor64('x4', 'x4 // 4294967296')} AS th FROM {src}_a4),
        {src}_votes AS (
          SELECT doc_id, j,
                 SUM(CAST((th // (CAST(1 AS HUGEINT) << CAST(j AS INT))) % 2 AS BIGINT)) AS ones,
                 COUNT(*) AS n
          FROM {src}_th, (SELECT unnest(range(0, 64)) AS j) bits
          GROUP BY doc_id, j),
        {src}_sim AS (
          SELECT s.doc_id, coalesce(v.sim, 0) AS simhash_u
          FROM {src} s LEFT JOIN (
            SELECT doc_id,
                   SUM(CASE WHEN 2 * ones > n
                       THEN CAST(1 AS HUGEINT) << CAST(j AS INT)
                       ELSE CAST(0 AS HUGEINT) END) AS sim
            FROM {src}_votes GROUP BY doc_id) v ON s.doc_id = v.doc_id)"""

    sql["doc_near_dedup_incremental"] = rf"""
        WITH fst AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
        snd AS (SELECT doc_id, text FROM documents WHERE doc_id >= 250),
        {_simhash_ctes('fst')},
        {_simhash_ctes('snd')},
        near AS (
          SELECT DISTINCT s.doc_id
          FROM snd_sim s JOIN fst_sim f
            ON bit_count(xor({_i64('s.simhash_u')}, {_i64('f.simhash_u')})) <= 3)
        SELECT d.doc_id FROM snd d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM near)
          AND d.doc_id = (SELECT MIN(d2.doc_id) FROM snd d2
                          WHERE md5(d2.text) = md5(d.text))"""

    # doc_langid_ngram: the trigram-profile + script-range classifier
    # (text/langid.py). The profile VALUES table and the script regex
    # ranges are generated from the SAME module constants, and weights
    # are integers, so the argmax is hash-exact on both sides.
    from gridfia_ray.text.langid import SCRIPT_RANGES, profile_sql_values

    _script_case = " ".join(
        f"WHEN regexp_matches(text, '[{re2}]') THEN '{lang}'"
        for lang, _, re2 in SCRIPT_RANGES
    )
    sql["doc_langid_ngram"] = rf"""
        WITH norm AS (
          SELECT doc_id, text,
                 ' ' || regexp_replace(lower(text), '[^a-z]+', ' ', 'g') || ' ' AS s
          FROM documents),
        idx AS (
          SELECT doc_id, s, unnest(generate_series(1, length(s) - 2)) AS i
          FROM norm WHERE length(s) >= 3),
        tri AS (SELECT doc_id, substr(s, CAST(i AS INT), 3) AS tg FROM idx),
        prof(lang, tg, w) AS (VALUES {profile_sql_values()}),
        scores AS (
          SELECT doc_id, lang, SUM(w) AS sc
          FROM tri JOIN prof USING (tg) GROUP BY doc_id, lang),
        best AS (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY sc DESC, lang ASC) AS rn
          FROM scores)
        SELECT n.doc_id,
               CASE {_script_case}
                    ELSE coalesce(b.lang, 'und') END AS lang_pred
        FROM norm n LEFT JOIN best b ON n.doc_id = b.doc_id AND b.rn = 1"""

    # shared CTE chain: exact 3-gram Jaccard candidate pairs (the
    # doc_dup_verified relation), reused by the clusters oracle
    _dup_ctes = r"""
        t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
                   FROM documents WHERE trim(text) <> ''),
        sh AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                      ELSE [array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)] END) s
               FROM t),
        e AS (SELECT doc_id, unnest(s) sh FROM sh),
        sz AS (SELECT doc_id, len(s) n FROM sh),
        cand AS (SELECT a.doc_id a, b.doc_id b, COUNT(*) c
                 FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
        j AS (SELECT cand.a, cand.b, c * 1.0 / (sa.n + sb.n - c) jac
              FROM cand JOIN sz sa ON sa.doc_id = cand.a
                        JOIN sz sb ON sb.doc_id = cand.b)"""
    sql["doc_dup_verified"] = f"""
        WITH {_dup_ctes}
        SELECT a, b, CAST(FLOOR(jac*1000000 + 0.5) AS BIGINT) AS jaccard_u
        FROM j WHERE jac >= 0.5"""
    # transitive closure of the pair relation: recursive min-label
    # propagation (UNION fixpoint terminates; the rep-<-node guard keeps
    # the state space finite even with cycles)
    sql["doc_dup_clusters"] = f"""
        WITH RECURSIVE {_dup_ctes},
        prs AS (SELECT a, b FROM j WHERE jac >= 0.5),
        ed AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
        cc(node, rep) AS (
          SELECT DISTINCT a, a FROM ed
          UNION
          SELECT ed.b, cc.rep FROM cc JOIN ed ON cc.node = ed.a WHERE cc.rep < ed.b
        )
        SELECT node AS doc_id, MIN(rep) AS cluster_rep FROM cc GROUP BY node"""
    sql["doc_canonical_dedup"] = f"""
        WITH RECURSIVE {_dup_ctes},
        prs AS (SELECT a, b FROM j WHERE jac >= 0.5),
        ed AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
        cc(node, rep) AS (
          SELECT DISTINCT a, a FROM ed
          UNION
          SELECT ed.b, cc.rep FROM cc JOIN ed ON cc.node = ed.a WHERE cc.rep < ed.b
        ),
        clus AS (SELECT node AS doc_id, MIN(rep) AS rep FROM cc GROUP BY node),
        best AS (SELECT c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY c.rep
                                      ORDER BY d.n_chars DESC, d.doc_id) rn
                 FROM clus c JOIN documents d USING (doc_id))
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM clus)
        UNION ALL
        SELECT doc_id FROM best WHERE rn = 1
        ORDER BY doc_id"""
    sql["ann_topk"] = """
        WITH q AS (SELECT vec_id qid, embedding e FROM embeddings WHERE vec_id IN (0, 1, 2)),
        s AS (SELECT q.qid query_id, v.vec_id,
                     list_cosine_similarity(v.embedding, q.e) sim
              FROM embeddings v CROSS JOIN q)
        SELECT query_id, vec_id, rank FROM
          (SELECT query_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) rank
           FROM s) WHERE rank <= 10"""
    sql["emb_knn_graph"] = """
        WITH s AS (
          SELECT a.vec_id, b.vec_id nbr_id,
                 list_cosine_similarity(a.embedding, b.embedding) sim
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
        SELECT vec_id, nbr_id, rank FROM
          (SELECT vec_id, nbr_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, nbr_id) rank
           FROM s) WHERE rank <= 5
        ORDER BY vec_id, rank"""
    sql["emb_hard_negatives"] = """
        WITH s AS (
          SELECT a.vec_id, b.vec_id neg_id,
                 list_cosine_similarity(a.embedding, b.embedding) sim
          FROM embeddings a JOIN embeddings b ON a.label <> b.label)
        SELECT vec_id, neg_id, rank FROM
          (SELECT vec_id, neg_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, neg_id) rank
           FROM s) WHERE rank <= 5
        ORDER BY vec_id, rank"""
    sql["rel_urgent_customers"] = """
        SELECT c_custkey, CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')"""
    sql["rel_quiet_customers"] = """
        SELECT c_custkey, CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')"""
    sql["events_props_sum"] = """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n_k
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        GROUP BY event_type"""
    sql["rel_rollup_pricing"] = """
        SELECT COALESCE(l_returnflag, '<ALL>') AS l_returnflag,
               COALESCE(l_linestatus, '<ALL>') AS l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_qty_c,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_price_c
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
    sql["rel_cube_orders"] = """
        SELECT COALESCE(o_orderstatus, '<ALL>') AS o_orderstatus,
               COALESCE(o_orderpriority, '<ALL>') AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS sum_price_c
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
    sql["rel_zscore"] = """
        WITH q AS (SELECT o_orderkey,
                          CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) x FROM orders),
        m AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
                     CAST(SUM(x) AS DOUBLE) sx,
                     CAST(SUM(x * x) AS DOUBLE) sxx FROM q)
        SELECT o_orderkey,
               CAST(FLOOR(((CAST(x AS DOUBLE) - sx / n)
                           / SQRT((sxx - sx * sx / n) / (n - 1.0)))
                          * 1000000 + 0.5) AS BIGINT) AS z_u
        FROM q, m"""
    sql["rel_correlation"] = """
        WITH m AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS BIGINT) n,
                 CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) sx,
                 CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) sy,
                 CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) sxx,
                 CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) syy,
                 CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                        * CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) sxy
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag,
               CAST(FLOOR(
                 ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                 * 1000000 + 0.5) AS BIGINT) AS r_u
        FROM m"""
    sql["events_transitions"] = """
        WITH s AS (SELECT LAG(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS from_type,
                          event_type AS to_type
                   FROM events),
        c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
              FROM c GROUP BY 1)
        SELECT c.from_type, c.to_type, c.n,
               CAST(FLOOR(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)
                          * 1000000 + 0.5) AS BIGINT) AS p_u
        FROM c JOIN t USING (from_type) ORDER BY 1, 2"""
    sql["events_top_paths"] = """
        WITH r AS (SELECT user_id, event_type,
                          ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events),
        p AS (SELECT user_id,
                     string_agg(event_type, '>' ORDER BY rn) AS path
              FROM r WHERE rn <= 5 GROUP BY user_id),
        c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM p GROUP BY path)
        SELECT path, n_users FROM c
        ORDER BY n_users DESC, path LIMIT 10"""
    sql["events_retention"] = """
        WITH uw AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 604800000000 AS week
                    FROM events),
        f AS (SELECT user_id, MIN(week) AS w0 FROM uw GROUP BY 1)
        SELECT f.w0 AS cohort_week,
               CAST(uw.week - f.w0 AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM uw JOIN f USING (user_id)
        GROUP BY 1, 2"""
    sql["rel_validate_orders"] = """
        SELECT 'custkey_not_null' AS rule,
               CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                 AS violations FROM orders
        UNION ALL SELECT 'price_min',
               CAST(COUNT(*) FILTER (WHERE o_totalprice < 1000) AS BIGINT)
               FROM orders
        UNION ALL SELECT 'status_domain',
               CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                    OR o_orderstatus NOT IN ('O', 'F')) AS BIGINT)
               FROM orders
        UNION ALL SELECT 'priority_shape',
               CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL OR NOT
                    regexp_full_match(o_orderpriority, '[1-5]-[A-Z]+')) AS BIGINT)
               FROM orders
        UNION ALL SELECT 'custkey_unique',
               CAST(COUNT(*) - COUNT(DISTINCT o_custkey) AS BIGINT)
               FROM orders"""
    sql["rel_pivot_status"] = """
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
                 AS o_orderstatus_O,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS o_orderstatus_F,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
                 AS o_orderstatus_P
        FROM orders GROUP BY o_orderpriority"""
    sql["rel_except_customers"] = """
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'"""
    sql["rel_outer_counts"] = """
        WITH a AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
                   FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
             b AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_f
                   FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
        SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
               COALESCE(n_urgent, -1) AS n_urgent,
               COALESCE(n_f, -1) AS n_f
        FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey"""
    sql["rel_ntile_orders"] = """
        SELECT o_orderkey,
               CAST(NTILE(7) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
                 AS tile
        FROM orders"""
    sql["rel_order_count_dist"] = """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM (SELECT c.c_custkey,
                     CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c LEFT JOIN orders o
                ON o.o_custkey = c.c_custkey
               AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
        GROUP BY c_count"""
    # unnest + generate_subscripts advance in lockstep, so (vec_id, i)
    # indexes each embedding element; CAST to DOUBLE first matches the
    # pipeline's float32 → float64 widening before quantization
    sql["emb_gram"] = """
        WITH q AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS i,
                          CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000
                                     + 0.5) AS BIGINT) AS qv
                   FROM embeddings)
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS dot
        FROM q a JOIN q b USING (vec_id)
        GROUP BY a.i, b.i"""
    sql["events_running_totals"] = """
        SELECT event_id,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c,
               COALESCE(LAG(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id), -1)
                 AS prev_c,
               COALESCE(LEAD(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id), -1)
                 AS next_c,
               ROW_NUMBER()
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events"""
    sql["events_daily_uniques"] = """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1"""
    sql["events_funnel"] = """
        WITH s1 AS (SELECT user_id, min(ts) t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(e.ts) t FROM events e
                    JOIN s1 USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > s1.t
                    GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(e.ts) t FROM events e
                    JOIN s2 USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > s2.t
                    GROUP BY e.user_id)
        SELECT s1.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS depth
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)"""
    sql["events_top_by_user"] = f"""
        SELECT user_id, event_id, {_sql_s6('value')} AS value_u
        FROM (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events WHERE event_type = 'purchase'
        ) WHERE rn <= 3"""
    sql["events_value_quantiles"] = f"""
        SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
               {_sql_s6('v')} AS value_u
        FROM (
          SELECT event_type, 2 AS q_pct, quantile_disc(value, 0.02) AS v
          FROM events GROUP BY event_type
          UNION ALL
          SELECT event_type, 50 AS q_pct, quantile_disc(value, 0.50) AS v
          FROM events GROUP BY event_type
          UNION ALL
          SELECT event_type, 98 AS q_pct, quantile_disc(value, 0.98) AS v
          FROM events GROUP BY event_type
        )"""
    sql["events_gapfill"] = f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS tu, value, event_id
                   FROM events),
        b AS (SELECT user_id,
                     ((MIN(tu) + 3599999999) // 3600000000) * 3600000000 AS t0,
                     (MAX(tu) // 3600000000) * 3600000000 AS t1
              FROM e GROUP BY user_id),
        g AS (SELECT user_id, UNNEST(range(t0, t1 + 1, 3600000000)) AS grid_ts
              FROM b WHERE t1 >= t0),
        sel AS (SELECT g.user_id, g.grid_ts, e.value,
                       ROW_NUMBER() OVER (
                         PARTITION BY g.user_id, g.grid_ts
                         ORDER BY e.tu DESC, e.event_id DESC) AS rn
                FROM g JOIN e ON e.user_id = g.user_id AND e.tu <= g.grid_ts)
        SELECT user_id, CAST(grid_ts AS BIGINT) AS grid_ts,
               {_sql_s6('value')} AS value_u
        FROM sel WHERE rn = 1 ORDER BY user_id, grid_ts"""
    sql["events_hourly"] = """
        SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY 1, 2"""
    sql["events_time_to_convert"] = """
        WITH v AS (SELECT user_id, MIN(ts) t0 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(e.ts) t1
              FROM events e JOIN v USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts >= v.t0
              GROUP BY e.user_id)
        SELECT c.user_id, epoch_us(c.t1) - epoch_us(v.t0) AS delay_us
        FROM c JOIN v USING (user_id)
        ORDER BY c.user_id"""
    sql["events_window_dedup"] = """
        WITH o AS (
          SELECT event_id, user_id, event_type, ts,
                 LAG(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) pts
          FROM events)
        SELECT event_id, user_id, event_type
        FROM o
        WHERE pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 3600000000::BIGINT
        ORDER BY event_id"""
    sql["events_sessions"] = """
        WITH d AS (
          SELECT user_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (
          SELECT user_id, ts, value,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM d)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM s GROUP BY user_id, sid"""
    sql["events_hopping"] = """
        SELECT user_id,
               strftime(time_bucket(INTERVAL '15 minutes', ts)
                        - i * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events, (SELECT unnest(range(0, 4)) i)
        GROUP BY 1, 2"""
    sql["doc_source_cap"] = """
        WITH r AS (
          SELECT doc_id, source,
                 md5(source || '|' || CAST(doc_id AS VARCHAR)) rk
          FROM documents),
        n AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY rk) rn
              FROM r)
        SELECT doc_id, source FROM n WHERE rn <= 15"""
    sql["events_sample_per_user"] = """
        WITH r AS (
          SELECT user_id, ts,
                 CAST(FLOOR(value*100 + 0.5) AS BIGINT) value_c,
                 md5(CAST(user_id AS VARCHAR) || '|' ||
                     CAST(epoch_ms(ts) AS VARCHAR) || '|' ||
                     CAST(CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS VARCHAR)) rk
          FROM events),
        n AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rk) rn FROM r)
        SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value_c
        FROM n WHERE rn <= 5"""
    sql["rel_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_c,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_c,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""
    sql["rel_top_customers"] = """
        SELECT o.o_custkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1.0 - l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey ORDER BY revenue_c DESC, o.o_custkey LIMIT 10"""
    sql["rel_regional_revenue"] = """
        SELECT n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1.0 - l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
        GROUP BY n.n_name"""
    sql["rel_bloom_join"] = """
        SELECT l_returnflag, COUNT(*) AS n_lines,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 400000.0
        GROUP BY l_returnflag ORDER BY l_returnflag"""
    sql["rel_priority_lines"] = """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1.0 - l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority"""
    sql["rel_prompt_ship_lines"] = """
        SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
          AND l.l_shipdate <= o.o_orderdate + INTERVAL 3 DAY"""
    sql["rel_returned_orders"] = """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority"""
    sql["rel_large_orders"] = """
        WITH s AS (SELECT l_orderkey,
                          CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT))
                               AS BIGINT) qty_c
                   FROM lineitem GROUP BY 1 HAVING qty_c > 25000)
        SELECT o.o_orderkey, o.o_custkey, s.qty_c,
               CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) price_c
        FROM orders o JOIN s ON s.l_orderkey = o.o_orderkey
        ORDER BY o.o_orderkey"""
    sql["rel_small_qty_revenue"] = """
        WITH pa AS (
          SELECT l_partkey,
                 SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem JOIN part
            ON p_partkey = l_partkey AND p_brand = 'Brand#1'
          GROUP BY l_partkey)
        SELECT l.l_partkey AS p_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT))
                 AS BIGINT) AS small_revenue_c
        FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE 5 * CAST(FLOOR(l.l_quantity*100 + 0.5) AS BIGINT) * pa.n < pa.s
        GROUP BY l.l_partkey"""
    sql["rel_top_supplier"] = """
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100 + 0.5)
                     AS BIGINT)) AS revenue_c
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, CAST(rev.revenue_c AS BIGINT) AS revenue_c
        FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        WHERE rev.revenue_c = (SELECT MAX(revenue_c) FROM rev)"""
    # 3 unrolled PageRank iterations, identical integer floor divisions
    _pr_it = """
        {out} AS (SELECT e.dst node,
                         CAST((15 * 1000000000000) // (100 * nn)
                              + SUM((85 * p.r) // (100 * d.deg)) AS BIGINT) r
                  FROM edges e
                  JOIN {prev} p ON p.node = e.src
                  JOIN deg d ON d.src = e.src, n
                  GROUP BY e.dst, nn)"""
    sql["graph_pagerank"] = (
        """
        WITH e0 AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey s
                    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        edges AS (SELECT 2 * c AS src, 2 * s + 1 AS dst FROM e0
                  UNION ALL SELECT 2 * s + 1, 2 * c FROM e0),
        deg AS (SELECT src, COUNT(*) deg FROM edges GROUP BY 1),
        n AS (SELECT COUNT(*) nn FROM deg),
        r0 AS (SELECT src AS node,
                      CAST(1000000000000 // nn AS BIGINT) r FROM deg, n),
        """
        + _pr_it.format(out="r1", prev="r0")
        + ","
        + _pr_it.format(out="r2", prev="r1")
        + """
        SELECT node, r AS rank_c FROM r2 ORDER BY node"""
    )
    from gridfia_ray.pipelines.sampling import rate_threshold_hex as _rth

    sql["doc_textrank"] = (
        """
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                   FROM documents WHERE text IS NOT NULL),
        pr0 AS (SELECT toks[i] a, toks[i+1] b
                FROM t, LATERAL (SELECT unnest(range(1, len(toks))) i) _
                WHERE len(toks) >= 2),
        und AS (SELECT a, b FROM pr0 WHERE a <> b),
        ew AS (SELECT DISTINCT a, b FROM
                 (SELECT a, b FROM und UNION ALL SELECT b, a FROM und)),
        vocab AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) id FROM
                    (SELECT DISTINCT a AS w FROM ew)),
        edges AS (SELECT va.id src, vb.id dst
                  FROM ew JOIN vocab va ON va.w = ew.a
                          JOIN vocab vb ON vb.w = ew.b),
        deg AS (SELECT src, COUNT(*) deg FROM edges GROUP BY 1),
        n AS (SELECT COUNT(*) nn FROM deg),
        r0 AS (SELECT src AS node,
                      CAST(1000000000000 // nn AS BIGINT) r FROM deg, n),
        """
        + _pr_it.format(out="r1", prev="r0")
        + ","
        + _pr_it.format(out="r2", prev="r1")
        + ","
        + _pr_it.format(out="r3", prev="r2")
        + """
        SELECT vocab.w AS word, r3.r AS rank_c
        FROM r3 JOIN vocab ON vocab.id = r3.node ORDER BY word"""
    )
    sql["graph_triangles"] = f"""
        WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
        e0 AS (SELECT DISTINCT a.s u, b.s v
               FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
        e AS (SELECT u, v FROM e0
              WHERE substr(md5(CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)),
                           1, 8) < '{_rth(_TRI_RATE)}')
        SELECT CAST(COUNT(*) AS BIGINT) n_triangles
        FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v"""
    sql["graph_components"] = f"""
        WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
        e0 AS (SELECT DISTINCT a.s u, b.s v
               FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
        e AS (SELECT u, v FROM e0
              WHERE substr(md5(CAST(u AS VARCHAR) || '|' || CAST(v AS VARCHAR)),
                           1, 8) < '{_rth(_CC_RATE)}'),
        ed AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        cc(node, rep) AS (
          SELECT DISTINCT u, u FROM ed
          UNION
          SELECT ed.v, cc.rep FROM cc JOIN ed ON cc.node = ed.u WHERE cc.rep < ed.v
        )
        SELECT node, MIN(rep) AS component FROM cc GROUP BY node"""
    sql["graph_bfs"] = """
        WITH RECURSIVE e0 AS (SELECT DISTINCT o.o_custkey c, l.l_suppkey s
                    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        edges AS (SELECT 2 * c AS src, 2 * s + 1 AS dst FROM e0
                  UNION ALL SELECT 2 * s + 1, 2 * c FROM e0),
        walk(node, dist) AS (
            SELECT 2, 0
            UNION
            SELECT e.dst, w.dist + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.dist < 3)
        SELECT node, CAST(MIN(dist) AS BIGINT) dist
        FROM walk GROUP BY node ORDER BY node"""
    sql["rel_wealthy_quiet"] = """
        WITH cb AS (SELECT c_custkey, c_nationkey,
                    CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal
                    FROM customer),
        s AS (SELECT CAST(COUNT(*) AS BIGINT) n,
                     CAST(SUM(bal) AS BIGINT) t
              FROM cb WHERE bal > 0),
        q AS (SELECT cb.c_nationkey, cb.bal FROM cb
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = cb.c_custkey
                                  AND o.o_orderpriority = '1-URGENT'))
        SELECT q.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(q.bal) AS BIGINT) AS total_c
        FROM q, s WHERE q.bal * s.n > s.t
        GROUP BY 1"""
    sql["rel_sole_slow_supplier"] = """
        WITH ls AS (SELECT l_orderkey, l_suppkey,
                           MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) any_r
                    FROM lineitem GROUP BY 1, 2),
        st AS (SELECT l_orderkey, COUNT(*) n_supp, SUM(any_r) n_r
               FROM ls GROUP BY 1),
        win AS (SELECT ls.l_suppkey FROM ls JOIN st USING (l_orderkey)
                WHERE st.n_supp >= 2 AND st.n_r = 1 AND ls.any_r = 1),
        cnt AS (SELECT l_suppkey, COUNT(*) numwait FROM win GROUP BY 1)
        SELECT s_name, CAST(numwait AS BIGINT) numwait
        FROM cnt JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        ORDER BY numwait DESC, s_name LIMIT 100"""
    sql["rel_nation_volume"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100
                                   + 0.5) AS BIGINT)) AS BIGINT) AS volume_c,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
    sql["rel_market_share"] = """
        WITH v AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 CAST(FLOOR(l_extendedprice*(1.0 - l_discount)*100
                            + 0.5) AS BIGINT) AS vol_c,
                 CASE WHEN sn.n_name = 'NATION_7' THEN 1 ELSE 0 END AS is_tgt
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region   ON cn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01'),
        agg AS (SELECT o_year,
                       CAST(SUM(vol_c * is_tgt) AS BIGINT) AS num_c,
                       CAST(SUM(vol_c) AS BIGINT) AS den_c
                FROM v GROUP BY o_year)
        SELECT o_year, num_c, den_c,
               CAST(FLOOR((CAST(num_c AS DOUBLE) / CAST(den_c AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS mkt_share_u
        FROM agg ORDER BY o_year"""
    # events_asof_join: DuckDB's native ASOF JOIN is the independent
    # re-statement of pipelines/joins.asof_join (backward, inner,
    # allow-exact-match). The generator guarantees unique (user_id, ts)
    # per event, so the match — and the hash — is deterministic.
    sql["events_asof_join"] = """
        WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
             v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
        SELECT c.event_id AS click_id, v.event_id AS view_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        FROM c ASOF JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts"""
    sql["events_error_window_join"] = """
        WITH p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
                   WHERE event_type = 'purchase'),
             e AS (SELECT user_id, ts AS ets, event_id AS error_id FROM events
                   WHERE event_type = 'error')
        SELECT p.purchase_id, e.error_id
        FROM p JOIN e ON p.user_id = e.user_id
          AND p.ts >= e.ets - INTERVAL 2 HOUR
          AND p.ts <= e.ets + INTERVAL 2 HOUR"""
    # the banded plan must reproduce the identical result set
    sql["events_error_window_banded"] = sql["events_error_window_join"]
    # A7 exact components: average-tie ranks are multiples of 0.5, so
    # the rank sums (and therefore 2·U and Cliff's delta via
    # gt − le = 2·U1 − n1·n2) are exact in f64 on both sides
    sql["events_group_compare"] = """
        WITH b AS (SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) v,
                          (event_type = 'purchase') is_x
                   FROM events WHERE event_type IN ('purchase', 'click')),
        r AS (SELECT is_x, RANK() OVER (ORDER BY v) rk,
                     COUNT(*) OVER (PARTITION BY v) tc
              FROM b),
        a AS (SELECT SUM(CASE WHEN is_x THEN rk + (tc - 1)/2.0 ELSE 0 END) r1,
                     CAST(COUNT(*) FILTER (is_x) AS DOUBLE) n1,
                     CAST(COUNT(*) FILTER (NOT is_x) AS DOUBLE) n2
              FROM r),
        u AS (SELECT n1, n2, r1 - n1*(n1 + 1)/2.0 u1 FROM a)
        SELECT CAST(n1 AS BIGINT) AS n_purchase,
               CAST(n2 AS BIGINT) AS n_click,
               CAST(2*LEAST(u1, n1*n2 - u1) AS BIGINT) AS u2,
               CAST(FLOOR(((2*u1 - n1*n2) / (n1*n2))*1000000 + 0.5) AS BIGINT)
                 AS cliffs_delta_u
        FROM u"""
    # Remaining rows-only (irreducibly approximate / seeded-hash ops):
    # doc_minhash_pairs, doc_simhash_pairs, ann_lsh_topk, ann_ivf_topk,
    # emb_near_dup — python brute-force/recall oracles live in tests/.
