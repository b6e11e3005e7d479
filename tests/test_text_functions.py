

def test_unicode_normalize_matches_unicodedata_and_duckdb(spark):
    """unicode_normalize must agree with Python's unicodedata (the
    UAX #15 reference available here) on the classic traps: composed
    vs decomposed accents, full-width ASCII, ligatures, superscripts —
    and NFC output must also agree with DuckDB's nfc_normalize (the
    oracle engine's normalizer) so normalized fingerprints stay
    oracle-checkable."""
    import unicodedata

    import duckdb
    from pyspark.sql import functions as F

    from flink_application_spark.functions.text import unicode_normalize

    samples = [
        "café",          # é composed
        "café",         # e + combining acute (decomposed)
        "ＨＥＬＬＯ",  # full-width HELLO
        "ﬁle",           # ﬁ ligature
        "x² + y³",  # superscripts
        "",                   # empty survives
        None,                 # NULL → NULL
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, t string"
    )
    for form in ("NFC", "NFKC"):
        got = {
            r["i"]: r["n"]
            for r in df.select("i", unicode_normalize(F.col("t"), form).alias("n")).collect()
        }
        want = {
            i: (unicodedata.normalize(form, s) if s is not None else None)
            for i, s in enumerate(samples)
        }
        assert got == want, form
    # the two decomposed/composed forms collapse to ONE fingerprint
    nfc = {
        r["i"]: r["n"]
        for r in df.select("i", unicode_normalize(F.col("t"), "NFC").alias("n")).collect()
    }
    assert nfc[0] == nfc[1]
    # DuckDB cross-check for NFC (the oracle engine's normalizer)
    for s in samples[:5]:
        d = duckdb.sql("SELECT nfc_normalize(?)", params=[s]).fetchone()[0]
        assert d == unicodedata.normalize("NFC", s)


def test_unicode_normalize_rejects_unknown_form(spark):
    import pytest
    from pyspark.sql import functions as F

    from flink_application_spark.functions.text import unicode_normalize

    with pytest.raises(ValueError):
        unicode_normalize(F.col("x"), "NFX")
