"""Character-trigram language identification (23 languages).

Replaces the 4-language stopword toy as the *real* language-ID path
(round-2 VERDICT ask #4). Construction is the classic character-n-gram
profile method (Cavnar & Trenkle 1994, "N-Gram-Based Text
Categorization"; the same family as fastText's char-n-gram features):

* 16 Latin-script languages get a trigram-frequency profile built at
  import time from small embedded seed passages (written for this repo;
  no external data). Text normalizes to ``[a-z ]`` (lowercase, every
  non-letter run → one space, padded), and a document's score for
  language L is the integer dot product ``Σ count(tg)·w_L(tg)`` over
  the top-``PROFILE_TOP`` trigrams of L's seed corpus. Integer weights
  (scaled relative frequencies) make scores order-independent and
  bit-exact, so the DuckDB oracle can hash-match the prediction.
* 7 non-Latin languages are detected by Unicode script ranges
  (vectorized regex count), with a fixed priority (kana before Han so
  Japanese text containing kanji resolves 'ja'; Hangul before Han).

Prediction = script hit if any, else argmax language by
(score DESC, lang ASC); 'und' when nothing matches. Everything is
vectorized: one pass builds a flat trigram-code array for the whole
batch (27-ary codes over the concatenated normalized text), scoring is
one table lookup + segment-sum per language.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# -- seed corpora (authored for this repo; ~2 passages per language) ---------

PROFILE_TEXTS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then runs away because "
        "it is afraid of the big black cat that lives in the house near the river "
        "where children play every day in the summer when the weather is warm and "
        "the sun shines brightly over the green fields "
        "yesterday morning we went to the market to buy bread milk and cheese but "
        "the shop was closed so we walked home through the old town and talked "
        "about the news"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft dann weg "
        "weil er angst vor der großen schwarzen katze hat die in dem haus am fluss "
        "wohnt wo die kinder jeden tag im sommer spielen wenn das wetter warm ist "
        "und die sonne hell über den grünen feldern scheint "
        "gestern morgen gingen wir zum markt um brot milch und käse zu kaufen aber "
        "der laden war geschlossen also gingen wir durch die altstadt nach hause "
        "und sprachen über die nachrichten"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et puis il "
        "court parce qu il a peur du grand chat noir qui habite dans la maison "
        "près de la rivière où les enfants jouent chaque jour en été quand le "
        "temps est chaud et que le soleil brille sur les champs verts "
        "hier matin nous sommes allés au marché pour acheter du pain du lait et "
        "du fromage mais le magasin était fermé alors nous sommes rentrés à la "
        "maison par la vieille ville en parlant des nouvelles"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego corre "
        "porque tiene miedo del gran gato negro que vive en la casa cerca del río "
        "donde los niños juegan cada día en verano cuando el tiempo es cálido y "
        "el sol brilla sobre los campos verdes "
        "ayer por la mañana fuimos al mercado a comprar pan leche y queso pero la "
        "tienda estaba cerrada así que volvimos a casa por el casco antiguo "
        "hablando de las noticias"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e poi corre via "
        "perché ha paura del grande gatto nero che vive nella casa vicino al "
        "fiume dove i bambini giocano ogni giorno in estate quando il tempo è "
        "caldo e il sole splende sui campi verdi "
        "ieri mattina siamo andati al mercato per comprare pane latte e formaggio "
        "ma il negozio era chiuso così siamo tornati a casa attraverso la città "
        "vecchia parlando delle notizie"
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso e depois corre "
        "porque tem medo do grande gato preto que mora na casa perto do rio onde "
        "as crianças brincam todos os dias no verão quando o tempo está quente e "
        "o sol brilha sobre os campos verdes "
        "ontem de manhã fomos ao mercado comprar pão leite e queijo mas a loja "
        "estava fechada então voltámos para casa pela cidade velha a falar das "
        "notícias"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en rent dan weg omdat "
        "hij bang is voor de grote zwarte kat die in het huis bij de rivier "
        "woont waar de kinderen elke dag in de zomer spelen als het weer warm is "
        "en de zon helder schijnt over de groene velden "
        "gisteren ochtend gingen we naar de markt om brood melk en kaas te kopen "
        "maar de winkel was gesloten dus liepen we door de oude stad naar huis "
        "en praatten over het nieuws"
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden och springer sedan "
        "iväg eftersom den är rädd för den stora svarta katten som bor i huset "
        "vid floden där barnen leker varje dag på sommaren när vädret är varmt "
        "och solen skiner över de gröna fälten "
        "igår morse gick vi till marknaden för att köpa bröd mjölk och ost men "
        "affären var stängd så vi gick hem genom gamla stan och pratade om "
        "nyheterna"
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund og løber så væk "
        "fordi den er bange for den store sorte kat der bor i huset ved floden "
        "hvor børnene leger hver dag om sommeren når vejret er varmt og solen "
        "skinner over de grønne marker "
        "i går morges gik vi til markedet for at købe brød mælk og ost men "
        "butikken var lukket så vi gik hjem gennem den gamle by og talte om "
        "nyhederne"
    ),
    "pl": (
        "szybki brązowy lis skacze przez leniwego psa a potem ucieka ponieważ "
        "boi się dużego czarnego kota który mieszka w domu nad rzeką gdzie "
        "dzieci bawią się każdego dnia latem kiedy pogoda jest ciepła a słońce "
        "świeci jasno nad zielonymi polami "
        "wczoraj rano poszliśmy na targ kupić chleb mleko i ser ale sklep był "
        "zamknięty więc wróciliśmy do domu przez stare miasto rozmawiając o "
        "wiadomościach"
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa a pak utíká protože se bojí "
        "velké černé kočky která bydlí v domě u řeky kde si děti hrají každý "
        "den v létě když je počasí teplé a slunce jasně svítí nad zelenými poli "
        "včera ráno jsme šli na trh koupit chléb mléko a sýr ale obchod byl "
        "zavřený tak jsme se vrátili domů přes staré město a povídali si o "
        "zprávách"
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș și apoi fuge pentru că se "
        "teme de pisica mare neagră care locuiește în casa de lângă râu unde "
        "copiii se joacă în fiecare zi vara când vremea este caldă și soarele "
        "strălucește peste câmpurile verzi "
        "ieri dimineață am mers la piață să cumpărăm pâine lapte și brânză dar "
        "magazinul era închis așa că ne am întors acasă prin orașul vechi "
        "vorbind despre știri"
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli ja juoksee sitten pois "
        "koska se pelkää suurta mustaa kissaa joka asuu talossa joen lähellä "
        "missä lapset leikkivät joka päivä kesällä kun sää on lämmin ja aurinko "
        "paistaa kirkkaasti vihreiden peltojen yllä "
        "eilen aamulla menimme torille ostamaan leipää maitoa ja juustoa mutta "
        "kauppa oli kiinni joten kävelimme kotiin vanhan kaupungin läpi ja "
        "puhuimme uutisista"
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett és aztán elszalad mert "
        "fél a nagy fekete macskától amelyik a folyó melletti házban lakik ahol "
        "a gyerekek minden nap játszanak nyáron amikor meleg az idő és a nap "
        "fényesen süt a zöld mezők felett "
        "tegnap reggel elmentünk a piacra kenyeret tejet és sajtot venni de a "
        "bolt zárva volt így hazasétáltunk az óvároson át és beszélgettünk a "
        "hírekről"
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve sonra kaçar "
        "çünkü nehrin yanındaki evde yaşayan büyük siyah kediden korkar orada "
        "çocuklar her gün yazın hava sıcak olduğunda ve güneş yeşil tarlaların "
        "üzerinde parlarken oynarlar "
        "dün sabah ekmek süt ve peynir almak için pazara gittik ama dükkan "
        "kapalıydı bu yüzden eski şehirden geçerek eve yürüdük ve haberler "
        "hakkında konuştuk"
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing malas dan kemudian lari "
        "karena takut pada kucing hitam besar yang tinggal di rumah dekat "
        "sungai tempat anak anak bermain setiap hari di musim panas ketika "
        "cuaca hangat dan matahari bersinar di atas ladang hijau "
        "kemarin pagi kami pergi ke pasar untuk membeli roti susu dan keju "
        "tetapi toko itu tutup jadi kami berjalan pulang melewati kota tua dan "
        "berbicara tentang berita"
    ),
}

PROFILE_TOP = 150  # trigrams kept per language
WEIGHT_SCALE = 1_000_000  # w = round(SCALE * count / total), integer

# Unicode-script detection: (lang, python regex range, RE2 range for the
# SQL oracle). Priority order matters: kana before Han (Japanese text
# contains kanji), Hangul before Han.
SCRIPT_RANGES: list[tuple[str, str, str]] = [
    ("ja", "぀-ヿ", r"\x{3040}-\x{30ff}"),
    ("ko", "가-힣ᄀ-ᇿ", r"\x{ac00}-\x{d7a3}\x{1100}-\x{11ff}"),
    ("zh", "一-鿿", r"\x{4e00}-\x{9fff}"),
    ("ru", "Ѐ-ӿ", r"\x{0400}-\x{04ff}"),
    ("ar", "؀-ۿ", r"\x{0600}-\x{06ff}"),
    ("el", "Ͱ-Ͽ", r"\x{0370}-\x{03ff}"),
    ("hi", "ऀ-ॿ", r"\x{0900}-\x{097f}"),
]

_NONALPHA = re.compile(r"[^a-z]+")
_N_CODES = 27**3  # trigram code space: 26 letters + space


def normalize(text: str) -> str:
    """lower → every non-[a-z] run → one space → pad. The SQL oracle
    applies the identical ``' ' || regexp_replace(lower(text),
    '[^a-z]+', ' ', 'g') || ' '``."""
    return " " + _NONALPHA.sub(" ", (text or "").lower()) + " "


def _char_codes(s: str) -> np.ndarray:
    """[a-z ] string → codes 0..26 (space = 26)."""
    arr = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.int32)
    return np.where(arr == ord(" "), 26, arr - ord("a"))


def _trigram_codes(codes: np.ndarray) -> np.ndarray:
    if len(codes) < 3:
        return np.empty(0, np.int32)
    return codes[:-2] * 729 + codes[1:-1] * 27 + codes[2:]


def _tg_str(code: int) -> str:
    chars = []
    for div in (729, 27, 1):
        c = (code // div) % 27
        chars.append(" " if c == 26 else chr(ord("a") + c))
    return "".join(chars)


def build_profiles() -> dict[str, dict[str, int]]:
    """{lang: {trigram_string: int weight}} — top PROFILE_TOP trigrams
    of each seed corpus, weight = round(SCALE·count/total). Ties broken
    by trigram asc (deterministic)."""
    out: dict[str, dict[str, int]] = {}
    for lang, text in PROFILE_TEXTS.items():
        tg = _trigram_codes(_char_codes(normalize(text)))
        codes, counts = np.unique(tg, return_counts=True)
        total = int(counts.sum())
        order = np.lexsort((codes, -counts))[:PROFILE_TOP]
        prof = {}
        for i in order:
            w = round(WEIGHT_SCALE * int(counts[i]) / total)
            if w > 0:
                prof[_tg_str(int(codes[i]))] = w
        out[lang] = prof
    return out


_PROFILES: dict[str, dict[str, int]] | None = None


def profiles() -> dict[str, dict[str, int]]:
    global _PROFILES
    if _PROFILES is None:
        _PROFILES = build_profiles()
    return _PROFILES


def profile_sql_values() -> str:
    """VALUES rows ``('lang', 'tg', w)`` for the DuckDB oracle —
    generated from the SAME profile dict so the two sides cannot
    drift."""
    rows = []
    for lang in sorted(PROFILE_TEXTS):
        for tg, w in sorted(profiles()[lang].items()):
            rows.append(f"('{lang}', '{tg}', {w})")
    return ", ".join(rows)


class NgramLangId:
    """map_batches stage (stateful: weight tables built once per
    worker). Output: (doc_id, lang_pred)."""

    def __init__(self):
        self.langs = sorted(PROFILE_TEXTS)
        self.weights = []
        for lang in self.langs:
            w = np.zeros(_N_CODES, np.int64)
            for tg, wt in profiles()[lang].items():
                w[_trigram_codes(_char_codes(tg))[0]] = wt
            self.weights.append(w)
        self.scripts = [(lang, re.compile(f"[{rng}]")) for lang, rng, _ in SCRIPT_RANGES]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        n = len(texts)
        # one flat code array for the whole batch; '\x00' separators
        # never form cross-doc trigrams (any window containing one is
        # masked out)
        norm = [normalize(t) for t in texts]
        joined = "\x00".join(norm) if norm else ""
        arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).astype(np.int32)
        sep = arr == 0
        codes = np.where(sep, -1, np.where(arr == ord(" "), 26, arr - ord("a")))
        lens = np.asarray([len(s) for s in norm], np.int64)
        doc_of = np.repeat(np.arange(n), lens + 1)[: len(arr)]
        if len(codes) >= 3:
            tg = codes[:-2] * 729 + codes[1:-1] * 27 + codes[2:]
            ok = ~(sep[:-2] | sep[1:-1] | sep[2:])
            tg = tg[ok]
            tg_doc = doc_of[:-2][ok]
        else:
            tg = np.empty(0, np.int64)
            tg_doc = np.empty(0, np.int64)
        # integer segment-sums: tg_doc is non-decreasing by construction
        seg_counts = np.bincount(tg_doc, minlength=n).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(seg_counts)[:-1]])
        best = np.full(n, -1, np.int64)
        best_score = np.zeros(n, np.int64)
        for li, w in enumerate(self.weights):
            vals = w[tg]
            scores = np.zeros(n, np.int64)
            nz = seg_counts > 0
            if vals.size:
                sums = np.add.reduceat(vals, offsets[nz]) if nz.any() else vals[:0]
                scores[nz] = sums
            better = scores > best_score
            best[better] = li
            best_score[better] = scores[better]
        preds = np.asarray(["und", *self.langs], dtype=object)[best + 1]
        # script overrides, in priority order (first hit wins)
        assigned = np.zeros(n, bool)
        for lang, pat in self.scripts:
            hit = texts.str.contains(pat).to_numpy() & ~assigned
            preds[hit] = lang
            assigned |= hit
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = preds
        return out
