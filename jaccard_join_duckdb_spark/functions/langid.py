"""Character-trigram language identification (Cavnar-Trenkle style).

The stopword-hit heuristic (:func:`.text.lang_id`) mislabels short or
stopword-free documents (round-5 verdict): a part list, a name line,
or agglutinative prose can contain zero stopwords yet be obviously
German from its character statistics. The classic fix from public
literature (Cavnar & Trenkle, "N-Gram-Based Text Categorization",
SDAIR 1994) scores documents against per-language character n-gram
profiles; this module implements the trigram-cosine variant with pure
column expressions — no UDFs — and profiles learned at import time
from small per-language seed texts embedded below (no downloads).

Scoring: ``cos(doc, lang) = dot / (||doc|| * ||lang||)`` where the
doc vector is its trigram counts and the lang vector the seed's top
trigram counts (integers — the dot and both squared norms are exact
integer aggregates, so only the final two sqrt/divide ops are
floating point, evaluated with the same operand shapes in the DuckDB
oracle twin for hash parity). Winner = max cosine, ties broken in
alphabetical language order via the same >=-chain the stopword
scorer uses.

Scale notes (100 TB): one explode per doc into trigram counts (a
narrow map-side shape), one equi-join against a broadcast profile
table (4 langs x <=96 trigrams), one groupBy(id) aggregation with
map-side partials. No driver materialization.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["LANG_PROFILES", "PROFILE_NORMS", "lang_id_trigram"]

# Seed prose written for this repo (generic sentences, public
# knowledge of each language only — no downloads). ~6 sentences per
# language; round 7 widens the set from 4 to 12 languages including
# two non-Latin scripts (Russian Cyrillic, Greek), where the script
# itself makes the trigram profiles nearly orthogonal.
_SEEDS = {
    "de": """
der schnelle braune fuchs springt über den faulen hund und die kinder
gehen nach der schule durch den park nach hause während die alte
katze in der warmen nachmittagssonne schläft die leute kaufen brot
und milch auf dem markt und sprechen über das wetter und die
nachrichten des tages eine große sprachmodell lernt aus texten die in
großem maßstab gesammelt wurden und die verarbeitung muss die
dokumente reinigen filtern und zerlegen bevor das training beginnt
wir müssen auch eine bessere gesellschaft für unsere kinder bauen
""",
    "en": """
the quick brown fox jumps over the lazy dog and the children walk
home from school through the park while the old cat sleeps in the
warm afternoon sun the people buy bread and milk at the market and
talk about the weather and the news of the day a large language
model learns from text collected at scale and the pipeline must
clean filter and tokenize the documents before training begins we
must also build a better society for our children
""",
    "es": """
el rápido zorro marrón salta sobre el perro perezoso y los niños
caminan a casa desde la escuela por el parque mientras el viejo gato
duerme bajo el sol cálido de la tarde la gente compra pan y leche en
el mercado y habla sobre el tiempo y las noticias del día un gran
modelo de lenguaje aprende de textos recogidos a gran escala y el
sistema debe limpiar filtrar y dividir los documentos antes de que
comience el entrenamiento también debemos construir una sociedad
mejor para nuestros hijos
""",
    "fr": """
le rapide renard brun saute par dessus le chien paresseux et les
enfants rentrent de l'école à la maison par le parc pendant que le
vieux chat dort au chaud soleil de l'après midi les gens achètent du
pain et du lait au marché et parlent du temps et des nouvelles du
jour un grand modèle de langue apprend à partir de textes recueillis
à grande échelle et le système doit nettoyer filtrer et découper les
documents avant le début de l'entraînement nous devons aussi
construire une meilleure société pour nos enfants
""",
    "it": """
la veloce volpe marrone salta sopra il cane pigro e i bambini tornano
a casa da scuola attraverso il parco mentre il vecchio gatto dorme al
caldo sole del pomeriggio la gente compra pane e latte al mercato e
parla del tempo e delle notizie del giorno un grande modello di
linguaggio impara dai testi raccolti su larga scala e il sistema deve
pulire filtrare e dividere i documenti prima che inizi
l'addestramento dobbiamo anche costruire una società migliore per i
nostri figli
""",
    "nl": """
de snelle bruine vos springt over de luie hond en de kinderen lopen
naar huis van school door het park terwijl de oude kat slaapt in de
warme middagzon de mensen kopen brood en melk op de markt en praten
over het weer en het nieuws van de dag een groot taalmodel leert van
teksten die op grote schaal verzameld zijn en het systeem moet de
documenten schoonmaken filteren en opdelen voordat de training begint
wij moeten ook een betere samenleving voor onze kinderen bouwen
""",
    "pl": """
szybki brązowy lis skacze nad leniwym psem a dzieci wracają do domu
ze szkoły przez park podczas gdy stary kot śpi w ciepłym popołudniowym
słońcu ludzie kupują chleb i mleko na rynku i rozmawiają o pogodzie i
wiadomościach dnia duży model językowy uczy się z tekstów zebranych
na wielką skalę a system musi oczyścić przefiltrować i podzielić
dokumenty zanim rozpocznie się trening musimy także zbudować lepsze
społeczeństwo dla naszych dzieci
""",
    "pt": """
a rápida raposa marrom salta sobre o cão preguiçoso e as crianças
voltam para casa da escola pelo parque enquanto o velho gato dorme ao
sol quente da tarde as pessoas compram pão e leite no mercado e falam
sobre o tempo e as notícias do dia um grande modelo de linguagem
aprende com textos coletados em grande escala e o sistema deve limpar
filtrar e dividir os documentos antes que o treinamento comece
devemos também construir uma sociedade melhor para os nossos filhos
""",
    "sv": """
den snabba bruna räven hoppar över den lata hunden och barnen går hem
från skolan genom parken medan den gamla katten sover i den varma
eftermiddagssolen folk köper bröd och mjölk på torget och pratar om
vädret och dagens nyheter en stor språkmodell lär sig av texter som
samlats in i stor skala och systemet måste rensa filtrera och dela
upp dokumenten innan träningen börjar vi måste också bygga ett bättre
samhälle för våra barn
""",
    "tr": """
hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve çocuklar
okuldan eve parkın içinden yürürler bu sırada yaşlı kedi sıcak öğleden
sonra güneşinde uyur insanlar pazardan ekmek ve süt alır hava durumu
ve günün haberleri hakkında konuşurlar büyük bir dil modeli geniş
ölçekte toplanan metinlerden öğrenir ve sistem eğitim başlamadan önce
belgeleri temizlemeli filtrelemeli ve bölmelidir çocuklarımız için
daha iyi bir toplum da kurmalıyız
""",
    "ru": """
быстрая коричневая лиса прыгает через ленивую собаку а дети идут
домой из школы через парк пока старый кот спит под тёплым полуденным
солнцем люди покупают хлеб и молоко на рынке и говорят о погоде и
новостях дня большая языковая модель учится на текстах собранных в
большом масштабе и система должна очистить отфильтровать и разделить
документы прежде чем начнётся обучение мы должны также построить
лучшее общество для наших детей
""",
    "el": """
η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο και τα παιδιά
γυρίζουν σπίτι από το σχολείο μέσα από το πάρκο ενώ η γριά γάτα
κοιμάται στον ζεστό απογευματινό ήλιο οι άνθρωποι αγοράζουν ψωμί και
γάλα στην αγορά και μιλούν για τον καιρό και τα νέα της ημέρας ένα
μεγάλο γλωσσικό μοντέλο μαθαίνει από κείμενα που συλλέγονται σε
μεγάλη κλίμακα και το σύστημα πρέπει να καθαρίσει να φιλτράρει και να
χωρίσει τα έγγραφα πριν αρχίσει η εκπαίδευση πρέπει επίσης να
χτίσουμε μια καλύτερη κοινωνία για τα παιδιά μας
""",
}

_TOP_K = 96


def _normalize(text: str) -> str:
    return re.sub(r"\s+", " ", (text or "").lower()).strip()


def _trigrams(text: str) -> list[str]:
    s = _normalize(text)
    return [s[i:i + 3] for i in range(len(s) - 2)]


def _build_profiles() -> dict[str, dict[str, int]]:
    profs = {}
    for lang, seed in _SEEDS.items():
        counts = Counter(_trigrams(seed))
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:_TOP_K]
        profs[lang] = dict(top)
    return profs


# (lang -> trigram -> integer count); deterministic at import.
LANG_PROFILES: dict[str, dict[str, int]] = _build_profiles()
# integer squared norms of each profile vector
PROFILE_NORMS: dict[str, int] = {
    lang: sum(c * c for c in p.values()) for lang, p in LANG_PROFILES.items()
}
_LANGS = sorted(LANG_PROFILES)  # de, el, en, es, fr, it, nl, pl, pt, ru, sv, tr


def lang_id_trigram(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(id, cos_<lang>..., pred_lang)`` — trigram cosine per
    language (round 6 decimals, one column per profile in
    alphabetical order) and the argmax label (alphabetical tie
    order, zero-trigram docs score 0.0 everywhere and label the
    first language — the same >=-chain as the stopword scorer,
    generated over however many profiles are loaded)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    n = F.length(norm)
    # descending-sequence footgun guard: sequence(1, n-2) flips to a
    # descending range when n < 3 — gate on length explicitly
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: F.substring(norm, i, 3)
        ),
    ).otherwise(F.array().cast("array<string>"))

    from pyspark.storagelevel import StorageLevel

    counts = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("tg"))
        .groupBy("id", "tg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # feeds BOTH the norm aggregation and the profile join —
        # uncached, the trigram explode executes twice
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # every doc's squared norm over ALL its trigrams (exact integers)
    norms = counts.groupBy("id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("nsq")
    )
    prof_rows = [
        (lang, tg, w)
        for lang in _LANGS
        for tg, w in sorted(LANG_PROFILES[lang].items())
    ]
    spark = df.sparkSession
    prof = spark.createDataFrame(prof_rows, "lang string, tg string, w long")
    dots = (
        counts.join(F.broadcast(prof), "tg")
        .groupBy("id", "lang")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("dot"))
    )
    scored = norms.join(dots, "id", "left")
    per_lang = [
        F.round(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("lang") == lang,
                        F.col("dot").cast("double")
                        / (
                            F.sqrt(F.col("nsq").cast("double"))
                            * F.sqrt(F.lit(float(PROFILE_NORMS[lang])))
                        ),
                    )
                ),
                F.lit(0.0),
            ),
            6,
        ).alias(f"cos_{lang}")
        for lang in _LANGS
    ]
    agg = scored.groupBy("id").agg(*per_lang)
    # >=-chain argmax over all profiles: lang_i wins iff its cosine
    # is >= every LATER language's (alphabetical tie preference)
    pred = None
    for i, lang in enumerate(_LANGS[:-1]):
        cond = None
        for other in _LANGS[i + 1:]:
            c = F.col(f"cos_{lang}") >= F.col(f"cos_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, lang) if pred is None else pred.when(cond, lang)
        )
    pred = pred.otherwise(_LANGS[-1])
    # docs with zero trigrams never enter `counts`; re-attach them
    # from the source with all-zero scores (left anti shape)
    base = df.select(F.col(id_col).alias("id"))
    out = base.join(agg, "id", "left").select(
        "id",
        *[
            F.coalesce(F.col(f"cos_{lang}"), F.lit(0.0)).alias(f"cos_{lang}")
            for lang in _LANGS
        ],
    )
    return out.select(
        "id",
        *[f"cos_{lang}" for lang in _LANGS],
        pred.alias("pred_lang"),
    )
