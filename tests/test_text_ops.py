"""Text-analysis operator tests (token/quality/langid/fingerprint)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from gridfia_ray.text.ops import LangId, QualityScorer, fingerprint64, token_count


@pytest.fixture
def docs():
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the quick brown fox and the lazy dog",
                "der Hund und die Katze ist nicht ein Tier",
                "le chat est dans la maison pour le soir",
                "",
                "  spaced   out\ttokens\nnewline  ",
            ],
        }
    )


class TestTokenCount:
    def test_counts(self, docs):
        out = token_count(docs)
        assert out["n_tokens"].tolist() == [8, 9, 9, 0, 4]


class TestQuality:
    def test_features(self, docs):
        out = QualityScorer()(docs)
        r = out.iloc[0]
        assert r["n_chars"] == len(docs.text[0])
        assert r["n_tokens"] == 8
        assert 0 < r["alpha_ratio"] < 1
        assert r["stopword_ratio"] == pytest.approx(3 / 8)  # the, and, the
        empty = out.iloc[3]
        assert empty["n_chars"] == 0 and empty["n_tokens"] == 0
        assert empty["alpha_ratio"] == 0.0


class TestLangId:
    def test_languages(self, docs):
        out = LangId()(docs)
        assert out["lang_pred"].tolist()[:3] == ["en", "de", "fr"]
        assert out["lang_pred"].iloc[3] == "und"

    def test_matches_scalar_reference(self, docs):
        """The vectorized scorer must reproduce the scalar loop (incl.
        the first-wins tie rule) token for token, using the SAME ASCII
        tokenization as the SQL oracle."""
        import re

        from gridfia_ray.text.ops import _LANG_STOPWORDS

        word = re.compile(r"[a-z]+")
        expect = []
        for t in docs["text"].fillna(""):
            toks = word.findall(t.lower())
            best, best_score = "und", 0
            for lang, stop in _LANG_STOPWORDS.items():
                score = sum(1 for w in toks if w in stop)
                if score > best_score:
                    best, best_score = lang, score
            expect.append(best)
        assert LangId()(docs)["lang_pred"].tolist() == expect

    def test_non_ascii_parity_with_oracle(self):
        """Non-ASCII input tokenizes identically on both sides ('für'
        splits to 'f'/'r' in ASCII runs) — regression for the oracle
        drift where Python matched 'für' but RE2 '[a-z]+' cannot."""
        import duckdb

        from gridfia_ray.text.ops import _LANG_STOPWORDS

        df = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["für für für", "der Hund ist nicht ein Tier"]}
        )
        got = LangId()(df)["lang_pred"].tolist()
        con = duckdb.connect()
        con.register("documents", df)

        def score(lang):
            lst = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
            return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"

        sql = f"""
        WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') toks
                   FROM documents),
        s AS (SELECT doc_id, {score('en')} s_en, {score('de')} s_de,
                     {score('fr')} s_fr, {score('es')} s_es FROM t)
        SELECT doc_id, CASE
          WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
          WHEN s_de > 0 AND s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
          WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_de AND s_fr >= s_es THEN 'fr'
          WHEN s_es > 0 AND s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
          ELSE 'und' END AS lang_pred
        FROM s ORDER BY doc_id"""
        oracle = [r[1] for r in con.execute(sql).fetchall()]
        assert got == oracle


class TestBpeTokens:
    def test_matches_re_findall(self, docs):
        import re

        from gridfia_ray.text.ops import bpe_token_count

        rx = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s")
        out = bpe_token_count(docs)
        expect = [len(rx.findall(t)) for t in docs["text"].fillna("")]
        assert out["n_bpe_tokens"].tolist() == expect

    def test_known_values(self):
        from gridfia_ray.text.ops import bpe_token_count

        df = pd.DataFrame({"doc_id": [0, 1], "text": ["don't stop", "e=mc^2!"]})
        # "don"," '","t"," stop" = 4 ; "e","=","mc","^","2","!" = 6
        assert bpe_token_count(df)["n_bpe_tokens"].tolist() == [4, 6]


class TestRepetition:
    def test_dup_lines_and_top_bigram(self):
        from gridfia_ray.text.ops import repetition_stats

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b\na b\nc d",  # dup line; bigram 'a b' twice
                    "x y z x y",  # 'x y' twice among 4 bigrams
                    "solo",  # no bigrams
                    "",  # empty
                ],
            }
        )
        out = repetition_stats(df)
        assert out["n_lines"].tolist() == [3, 1, 1, 1]
        assert out["n_dup_lines"].tolist() == [1, 0, 0, 0]
        # doc 0 tokens: a b a b c d -> 5 bigrams, 'a b' twice
        assert out["n_2grams"].tolist() == [5, 4, 0, 0]
        assert out["top2gram_count"].tolist() == [2, 2, 0, 0]


class TestFingerprint:
    def test_deterministic_and_order_sensitive(self):
        a = pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]})
        b = pd.DataFrame({"doc_id": [0], "text": ["gamma beta alpha"]})
        fa = fingerprint64(a)["fingerprint"].iloc[0]
        fb = fingerprint64(b)["fingerprint"].iloc[0]
        fa2 = fingerprint64(a)["fingerprint"].iloc[0]
        assert fa == fa2 and fa != fb
        assert fingerprint64(pd.DataFrame({"doc_id": [0], "text": [""]}))["fingerprint"].iloc[0] == 0

    def test_whitespace_invariant(self):
        a = pd.DataFrame({"doc_id": [0], "text": ["alpha  beta\tgamma"]})
        b = pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]})
        assert fingerprint64(a)["fingerprint"].iloc[0] == fingerprint64(b)["fingerprint"].iloc[0]


class TestChunkDocuments:
    def test_overlap_and_boundaries(self, ray_session):
        from gridfia_ray.text.ops import chunk_documents

        toks = [f"t{i}" for i in range(300)]
        df = pd.DataFrame(
            {"doc_id": np.int64([1, 2, 3]),
             "text": [" ".join(toks), "a b c", ""]}
        )
        got = (
            chunk_documents(rd.from_pandas(df).repartition(2),
                            chunk_tokens=128, overlap=16)
            .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        )
        d1 = got[got["doc_id"] == 1]
        # 300 tokens, step 112: starts 0,112,224 → sizes 128,128,76
        assert d1["n_tokens"].tolist() == [128, 128, 76]
        c0, c1 = d1["chunk"].iloc[0].split(), d1["chunk"].iloc[1].split()
        assert c0 == toks[0:128] and c1 == toks[112:240]
        assert c0[-16:] == c1[:16]  # the overlap region
        d2 = got[got["doc_id"] == 2]
        assert d2["n_tokens"].tolist() == [3] and d2["chunk"].iloc[0] == "a b c"
        assert (got["doc_id"] == 3).sum() == 0  # empty docs yield nothing

    def test_bad_params(self, ray_session):
        from gridfia_ray.text.ops import chunk_documents

        df = pd.DataFrame({"doc_id": [1], "text": ["x"]})
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(rd.from_pandas(df), chunk_tokens=8, overlap=8)


class TestRedactPII:
    def test_planted_pii_redacted(self, ray_session):
        import pandas as pd

        from gridfia_ray.text.ops import redact_pii

        batch = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "mail a.b-c_d@example.co.uk now",
                    "from 192.168.1.255 call +141555501234 ok",
                    "clean text, no pii at 3.14 or v1.2.3",
                ],
            }
        )
        out = redact_pii(batch)
        assert out["text_redacted"].tolist() == [
            "mail <EMAIL> now",
            "from <IP> call <PHONE> ok",
            "clean text, no pii at 3.14 or v1.2.3",
        ]
        assert out["n_redactions"].tolist() == [1, 2, 0]

    def test_pin_corpus_has_matches(self, ray_session):
        import pyarrow.parquet as pq

        from gridfia_ray import oracle_pins

        p = oracle_pins.ensure_docpin()["pii_documents"]
        import pandas as pd

        from gridfia_ray.text.ops import redact_pii

        out = redact_pii(pq.read_table(p).to_pandas())
        # every third doc carries 2 emails + 1 IP + 1 phone
        assert (out["n_redactions"].to_numpy()[::3] == 4).all()
        assert (out["n_redactions"].to_numpy()[1::3] == 0).all()

    def test_ascii_semantics_match_re2(self, ray_session):
        """\\d and \\b are compiled re.ASCII so Python matches RE2's
        ASCII-only semantics on non-ASCII text (review r4)."""
        import pandas as pd

        from gridfia_ray.text.ops import redact_pii

        batch = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "café10.1.1.1 end",          # é is NOT a word char in ASCII
                    "call +١٢٣٤٥٦٧٨٩٠١ ok",  # arabic digits
                ],
            }
        )
        out = redact_pii(batch)
        assert out["text_redacted"][0] == "café<IP> end"
        assert out["text_redacted"][1] == batch["text"][1]  # untouched


class TestCompressionStats:
    def test_matches_sequential_zlib_on_sf_docs(self, ray_session):
        import zlib

        import pyarrow.parquet as pq

        from gridfia_ray.text.ops import compression_stats

        docs = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        got = (
            rd.from_pandas(docs)
            .repartition(5)
            .map_batches(compression_stats, batch_format="pandas")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = docs.sort_values("doc_id").reset_index(drop=True)
        raw = [t.encode("utf-8") for t in want["text"].fillna("")]
        assert got["raw_len"].tolist() == [len(b) for b in raw]
        assert got["zlib_len"].tolist() == [len(zlib.compress(b, 6)) for b in raw]
        assert (
            got["ratio_milli"]
            == np.where(
                got["raw_len"] > 0,
                (1000 * got["zlib_len"]) // got["raw_len"].clip(lower=1),
                0,
            )
        ).all()

    def test_repetitive_text_compresses_below_prose(self, ray_session):
        from gridfia_ray.text.ops import compression_stats

        rng = np.random.RandomState(0)
        prose = " ".join(
            "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), 8)) for _ in range(200)
        )
        df = pd.DataFrame(
            {
                "doc_id": np.int64([0, 1, 2]),
                "text": ["spam ham " * 400, prose, ""],
            }
        )
        out = compression_stats(df)
        assert out["ratio_milli"].iloc[0] < out["ratio_milli"].iloc[1] / 3
        assert out["ratio_milli"].iloc[2] == 0 and out["raw_len"].iloc[2] == 0


class TestNormalizeText:
    def test_nfc_collapses_decomposed_twins(self, ray_session):
        from gridfia_ray.text.ops import normalize_text

        df = pd.DataFrame(
            {"doc_id": np.int64([0, 1]), "text": ["école", "école"]}
        )
        out = normalize_text(df)
        assert out["text"].iloc[0] == out["text"].iloc[1]
        assert out["n_chars"].tolist() == [5, 5]

    def test_nfkc_and_casefold(self, ray_session):
        from gridfia_ray.text.ops import normalize_text

        df = pd.DataFrame(
            {"doc_id": np.int64([0, 1]), "text": ["ﬁNANCE ４２", "finance 42"]}
        )
        nfc = normalize_text(df)  # NFC keeps ligature/fullwidth distinct
        assert nfc["text"].iloc[0] != nfc["text"].iloc[1].upper()
        nfkc = normalize_text(df, form="NFKC", casefold=True)
        assert nfkc["text"].iloc[0] == nfkc["text"].iloc[1]

    def test_bad_form_rejected(self, ray_session):
        from gridfia_ray.text.ops import normalize_text

        with pytest.raises(ValueError, match="normalization form"):
            normalize_text(pd.DataFrame({"doc_id": np.int64([0]), "text": ["x"]}), form="NFX")
