"""marker_lang_scores with the real-language marker sets
(operators/text.LANG_MARKERS) over natural-language sentences."""

from qwery_spark.operators.text import LANG_MARKERS, marker_lang_scores

SENTENCES = [
    ("en", "the cat sat on the mat and looked to the window for hours"),
    ("en", "this is the report that we prepared with care for the board"),
    ("de", "der hund und die katze sind nicht im haus ich bin mit dir"),
    ("de", "das ist nicht der richtige weg und ich gehe mit der gruppe"),
    ("fr", "le chien est dans la maison et je ne vais pas pour toujours"),
    ("fr", "les enfants sont dans le jardin pour la fête je crois"),
    ("es", "el perro y los gatos están en las casas pero una vez más"),
    ("es", "una historia sobre el mar y los barcos pero como más tarde"),
    ("it", "il cane che non mangia di notte è anche il re della casa"),
    ("it", "gli amici che sono qui non vanno via anche di sera"),
    ("pt", "o cachorro e os gatos não estão em uma casa para você ver mais"),
]


def test_real_language_markers_identify_sentences(spark):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(SENTENCES)],
        "id long, expected string, text string",
    )
    out = marker_lang_scores(df, "id", "text", LANG_MARKERS)
    got = {r["id"]: r["lang_guess"] for r in out.collect()}
    for i, (lang, _) in enumerate(SENTENCES):
        assert got[i] == lang, f"sentence {i}: expected {lang}, got {got[i]}"


def test_marker_scores_columns_present(spark):
    df = spark.createDataFrame([(0, "the and of")], "id long, text string")
    out = marker_lang_scores(df, "id", "text", LANG_MARKERS)
    assert set(out.columns) == {"id", "lang_guess"} | {
        f"score_{lang}" for lang in LANG_MARKERS
    }
    row = out.collect()[0]
    assert row["score_en"] == 3 and row["lang_guess"] == "en"
