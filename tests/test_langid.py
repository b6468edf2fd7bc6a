"""Trigram language ID: accuracy on crafted multilingual sentences
NOT in the seed profiles — including the short / stopword-free docs
the stopword heuristic mislabels (its round-5 verdict blind spot) and
(round 7) eight more languages with two non-Latin scripts — plus edge
semantics (zero-trigram docs) and profile determinism. DuckDB hash
parity is enforced by the driver gate (text_lang_id_trigram); these
tests pin accuracy and contract."""

from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.functions.langid import (
    LANG_PROFILES,
    PROFILE_NORMS,
    lang_id_trigram,
)

ALL_LANGS = sorted(LANG_PROFILES)

# held-out sentences (none appear in the seed texts)
FIXTURE = [
    (0, "en", "science moves forward when careful people measure things"),
    (1, "en", "bring several boxes to the station before nine"),
    (2, "de", "wissenschaft bewegt sich vorwärts wenn sorgfältige "
              "menschen dinge messen"),
    (3, "de", "bringe mehrere kisten vor neun uhr zum bahnhof"),
    (4, "es", "la ciencia avanza cuando personas cuidadosas miden "
              "las cosas con atención"),
    (5, "es", "lleva varias cajas a la estación antes de las nueve"),
    (6, "fr", "la science avance quand des personnes soigneuses "
              "mesurent les choses"),
    (7, "fr", "apporte plusieurs boîtes à la gare avant neuf heures"),
    # short / stopword-free: the stopword scorer's blind spot
    (8, "de", "geschwindigkeitsbegrenzung autobahn ausfahrt"),
    (9, "en", "weather forecast thursday morning"),
    (10, "es", "ayuntamiento estación ferrocarril"),
    # round-7 languages, held-out sentences
    (11, "it", "la scienza va avanti quando delle persone attente "
               "misurano le cose con cura ogni giorno"),
    (12, "pt", "a ciência avança quando pessoas cuidadosas medem as "
               "coisas com atenção todos os dias"),
    (13, "nl", "de wetenschap gaat vooruit wanneer zorgvuldige mensen "
               "dingen nauwkeurig meten elke dag opnieuw"),
    (14, "sv", "vetenskapen går framåt när noggranna människor mäter "
               "saker varje dag under hela året"),
    (15, "pl", "nauka idzie naprzód kiedy uważni ludzie dokładnie "
               "mierzą rzeczy każdego dnia przez cały rok"),
    (16, "tr", "dikkatli insanlar her gün bir şeyleri özenle "
               "ölçtüğünde bilim ileriye doğru gider"),
    # non-Latin scripts
    (17, "ru", "наука движется вперёд когда внимательные люди "
               "тщательно измеряют вещи каждый день"),
    (18, "el", "η επιστήμη προχωρά μπροστά όταν προσεκτικοί άνθρωποι "
               "μετρούν τα πράγματα κάθε μέρα"),
    # round-8 confusable-pair stress (round-7 verdict #2): the SAME
    # sentence rendered in each language of the historically-colliding
    # pairs (de/nl, es/pt, fr/it) — near-parallel content is exactly
    # the input class that broke the round-7 parallel-seed profiles,
    # so these pin that the non-parallel seeds keep the pairs apart
    # even when the documents themselves are parallel.
    (19, "nl", "de kinderen spelen elke middag in het park bij het "
               "water"),
    (20, "de", "die kinder spielen jeden nachmittag im park am wasser"),
    (21, "pt", "as crianças brincam todas as tardes no parque perto "
               "da água"),
    (22, "es", "los niños juegan todas las tardes en el parque cerca "
               "del agua"),
    (23, "fr", "les enfants jouent tous les après midi dans le parc "
               "près de l'eau"),
    (24, "it", "i bambini giocano ogni pomeriggio nel parco vicino "
               "all'acqua"),
]


def test_accuracy_on_held_out_sentences(spark):
    df = spark.createDataFrame(
        [(i, t) for i, _, t in FIXTURE], ["doc_id", "text"]
    )
    got = {
        r["id"]: r["pred_lang"]
        for r in lang_id_trigram(df, "doc_id", "text").collect()
    }
    want = {i: lang for i, lang, _ in FIXTURE}
    wrong = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not wrong, wrong


def test_beats_stopword_heuristic_on_stopword_free_docs(spark):
    """The three stopword-free docs score ZERO stopword hits in every
    language (the old scorer labels them all 'de' by tie order); the
    trigram scorer gets them right."""
    from jaccard_join_duckdb_spark.functions.text import lang_id

    short = [(i, lang, t) for i, lang, t in FIXTURE if 8 <= i <= 10]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in short], ["doc_id", "text"]
    )
    old = {r["doc_id"]: r for r in lang_id(df, "doc_id", "text").collect()}
    for i, lang, _ in short:
        r = old[i]
        assert (r["hits_de"], r["hits_en"], r["hits_es"], r["hits_fr"]) \
            == (0, 0, 0, 0)
    new = {
        r["id"]: r["pred_lang"]
        for r in lang_id_trigram(df, "doc_id", "text").collect()
    }
    assert new == {i: lang for i, lang, _ in short}


def test_zero_trigram_docs_all_zero_scores(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, None), (3, "   x  ")],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in
            lang_id_trigram(df, "doc_id", "text").collect()}
    assert len(rows) == 4  # every doc survives
    for i in range(4):
        r = rows[i]
        assert all(r[f"cos_{lang}"] == 0.0 for lang in ALL_LANGS)
        assert r["pred_lang"] == ALL_LANGS[0]  # alphabetical tie order


def test_profiles_deterministic_and_normed():
    assert ALL_LANGS == [
        "de", "el", "en", "es", "fr", "it",
        "nl", "pl", "pt", "ru", "sv", "tr",
    ]
    for lang, prof in LANG_PROFILES.items():
        assert 96 <= len(prof) <= 192
        assert PROFILE_NORMS[lang] == sum(c * c for c in prof.values())
        assert all(isinstance(w, int) and w > 0 for w in prof.values())


def test_non_latin_profiles_nearly_orthogonal():
    """Cyrillic/Greek profiles share (almost) no trigrams with the
    Latin-script ones — the script itself separates them, so a
    Russian doc can never be confused with e.g. Polish."""
    latin = [lang for lang in ALL_LANGS if lang not in ("ru", "el")]
    for nl_lang in ("ru", "el"):
        prof = set(LANG_PROFILES[nl_lang])
        for lang in latin:
            shared = prof & set(LANG_PROFILES[lang])
            # spaces around short words can coincide; no real overlap
            assert len(shared) <= 3, (nl_lang, lang, shared)


def test_scores_are_cosines_in_unit_range(spark):
    df = spark.createDataFrame(
        [(i, t) for i, _, t in FIXTURE], ["doc_id", "text"]
    )
    out = lang_id_trigram(df, "doc_id", "text")
    cols = [f"cos_{lang}" for lang in ALL_LANGS]
    bad = out.filter(
        (F.least(*cols) < 0) | (F.greatest(*cols) > 1)
    ).count()
    assert bad == 0
