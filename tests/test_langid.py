"""Character-trigram language ID: accuracy floor on held-out sentences
(none appear in the profile seed corpora), script detection exactness,
and Python↔SQL normalization equivalence."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gridfia_ray.text.langid import (
    PROFILE_TEXTS,
    SCRIPT_RANGES,
    NgramLangId,
    normalize,
    profile_sql_values,
    profiles,
)

HELD_OUT_LATIN = {
    "en": "she opened the window and looked at the mountains in the distance while drinking her coffee",
    "de": "sie öffnete das fenster und schaute auf die berge in der ferne während sie ihren kaffee trank",
    "fr": "elle a ouvert la fenêtre et regardé les montagnes au loin en buvant son café",
    "es": "ella abrió la ventana y miró las montañas a lo lejos mientras bebía su café",
    "it": "lei ha aperto la finestra e ha guardato le montagne in lontananza mentre beveva il suo caffè",
    "pt": "ela abriu a janela e olhou para as montanhas ao longe enquanto bebia o seu café",
    "nl": "zij opende het raam en keek naar de bergen in de verte terwijl ze haar koffie dronk",
    "sv": "hon öppnade fönstret och tittade på bergen i fjärran medan hon drack sitt kaffe",
    "da": "hun åbnede vinduet og kiggede på bjergene i det fjerne mens hun drak sin kaffe",
    "pl": "otworzyła okno i patrzyła na góry w oddali pijąc swoją kawę",
    "cs": "otevřela okno a dívala se na hory v dálce zatímco pila svou kávu",
    "ro": "ea a deschis fereastra și a privit munții în depărtare în timp ce își bea cafeaua",
    "fi": "hän avasi ikkunan ja katsoi kaukaisia vuoria juodessaan kahviaan",
    "hu": "kinyitotta az ablakot és a távoli hegyeket nézte miközben a kávéját itta",
    "tr": "pencereyi açtı ve kahvesini içerken uzaktaki dağlara baktı",
    "id": "dia membuka jendela dan melihat gunung gunung di kejauhan sambil minum kopinya",
}
HELD_OUT_SCRIPT = {
    "zh": "今天天气很好我们去公园散步",
    "ja": "今日はいい天気なので公園へさんぽに行きます",
    "ko": "오늘은 날씨가 좋아서 공원에 산책하러 갑니다",
    "ru": "сегодня хорошая погода и мы идём гулять в парк",
    "ar": "الطقس جميل اليوم ونحن نذهب للتنزه في الحديقة",
    "el": "ο καιρός είναι καλός σήμερα και πηγαίνουμε βόλτα στο πάρκο",
    "hi": "आज मौसम अच्छा है और हम पार्क में टहलने जाते हैं",
}


@pytest.fixture(scope="module")
def lid():
    return NgramLangId()


def _classify(lid, texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    return lid(df)["lang_pred"].tolist()


class TestAccuracy:
    def test_latin_floor(self, lid):
        preds = _classify(lid, list(HELD_OUT_LATIN.values()))
        correct = sum(p == e for p, e in zip(preds, HELD_OUT_LATIN))
        # pl/cs lose their distinguishing diacritics under the [a-z]
        # normalization and may confuse on short text; everything else
        # must hit
        assert correct >= 14, list(zip(HELD_OUT_LATIN, preds))
        for lang in ["en", "de", "fr", "es", "it", "nl", "sv", "fi", "hu", "tr", "id"]:
            i = list(HELD_OUT_LATIN).index(lang)
            assert preds[i] == lang, (lang, preds[i])

    def test_script_exact(self, lid):
        preds = _classify(lid, list(HELD_OUT_SCRIPT.values()))
        assert preds == list(HELD_OUT_SCRIPT)

    def test_und_and_empty(self, lid):
        preds = _classify(lid, ["12345 67890 !!!", "", "   "])
        assert preds == ["und", "und", "und"]

    def test_training_texts_all_correct(self, lid):
        """In-sample sanity: every profile's own seed passage classifies
        as itself."""
        preds = _classify(lid, list(PROFILE_TEXTS.values()))
        assert preds == list(PROFILE_TEXTS)


class TestSqlParity:
    def test_normalize_matches_sql(self):
        con = duckdb.connect()
        texts = ["Hello, World! 42", "  ", "ÜBER-maß", "a", "", "mixed 日本語 text"]
        for t in texts:
            got = con.execute(
                "SELECT ' ' || regexp_replace(lower(?), '[^a-z]+', ' ', 'g') || ' '", [t]
            ).fetchone()[0]
            assert got == normalize(t), repr(t)

    def test_profile_values_well_formed(self):
        vals = profile_sql_values()
        con = duckdb.connect()
        n = con.execute(
            f"SELECT count(*), count(DISTINCT lang) FROM (VALUES {vals}) p(lang, tg, w)"
        ).fetchone()
        assert n[1] == len(PROFILE_TEXTS) == 16
        assert n[0] == sum(len(v) for v in profiles().values())

    def test_script_ranges_agree(self):
        """Python literal ranges and RE2 ranges cover the same sample
        chars (one per script)."""
        import re

        con = duckdb.connect()
        samples = {"ja": "ぁ", "ko": "가", "zh": "中", "ru": "д", "ar": "ع",
                   "el": "λ", "hi": "ह"}
        for lang, rng, re2 in SCRIPT_RANGES:
            ch = samples[lang]
            assert re.search(f"[{rng}]", ch), lang
            assert con.execute(
                f"SELECT regexp_matches(?, '[{re2}]')", [ch]
            ).fetchone()[0], lang
