"""Property tests for the text/dedup operator algebra.

200 adversarial pseudo-random strings (fixed seed: unicode, punctuation
soup, whitespace runs, empty/short edge shapes) are pushed through the
operators in ONE DataFrame; each law is asserted as a zero-violations
count, so the whole suite costs a handful of Spark jobs rather than a
JVM round-trip per example."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from clickbom_spark.ext import text as X


ALPHABETS = [
    string.ascii_letters + string.digits + "  ",
    string.printable,
    "àéîöü ñçßعربي中文字 🙂🙃 ",
    " \t\n" + string.punctuation,
]


def make_corpus():
    rng = random.Random(20260813)
    texts = ["", " ", "one", "a  b", "x.y,z!"]
    for _ in range(195):
        alpha = rng.choice(ALPHABETS)
        n = rng.randint(0, 300)
        texts.append("".join(rng.choice(alpha) for _ in range(n)))
    return texts


@pytest.fixture(scope="module")
def corpus(spark):
    texts = make_corpus()
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    ).cache()


def violations(df, cond):
    return df.where(~F.coalesce(cond, F.lit(False))).count()


def test_normalize_idempotent(corpus):
    norm1 = X.normalize_text(F.col("text"))
    norm2 = X.normalize_text(X.normalize_text(F.col("text")))
    assert violations(corpus, norm1 == norm2) == 0


def test_normalize_output_charset(corpus):
    norm = X.normalize_text(F.col("text"))
    assert violations(corpus, norm.rlike(r"^[a-z0-9 ]*$")) == 0
    assert violations(corpus, ~norm.rlike("  ")) == 0  # no double spaces


def test_token_count_consistency(corpus):
    assert (
        violations(
            corpus, X.token_count(F.col("text")) == F.size(X.tokens(F.col("text")))
        )
        == 0
    )


def test_fingerprint_case_and_trailing_punct_invariant(corpus):
    base = X.fingerprint(F.col("text"))
    upper = X.fingerprint(F.upper(F.col("text")))
    punct = X.fingerprint(F.concat(F.col("text"), F.lit("!!! ")))
    assert violations(corpus, base == upper) == 0
    assert violations(corpus, base == punct) == 0


def test_shingle_count_law(corpus):
    toks = X.tokens(X.normalize_text(F.col("text")))
    n = F.size(toks)
    grams = X.shingles(F.col("text"), 3)
    short = (n < 3) & (F.size(grams) == 1)
    long = (n >= 3) & (F.size(grams) >= 1) & (F.size(grams) <= n - 2)
    assert violations(corpus, short | long) == 0


def test_passage_chunks_cover_all_tokens(corpus):
    toks = X.tokens(X.normalize_text(F.col("text")))
    chunks = X.passage_chunks(F.col("text"), size=16, stride=8)
    rejoined = F.array_distinct(
        F.flatten(F.transform(chunks, lambda c: F.split(c, " ")))
    )
    missing = F.size(F.array_except(F.array_distinct(toks), rejoined))
    # every distinct token must appear in at least one passage
    assert violations(corpus, missing == 0) == 0


def test_winnowing_fingerprints_nonempty_and_bounded(corpus):
    norm_len = F.length(X.normalize_text(F.col("text")))
    fps = X.winnowing_fingerprints(F.col("text"))
    assert violations(corpus, (F.size(fps) >= 1)) == 0
    assert violations(corpus, F.size(fps) <= F.greatest(norm_len, F.lit(1))) == 0


def test_quality_score_bounded(corpus):
    q = X.quality_score(F.col("text"))
    assert violations(corpus, (q >= 0.0) & (q <= 1.0)) == 0


def test_hashed_embedding_laws(corpus):
    """Hashing-trick embedding: unit norm (or exactly zero for empty
    docs), determinism across evaluations, and exact equality for
    duplicate texts."""
    emb = X.hashed_embedding(F.col("text"), dim=16)
    df = corpus.select("id", "text", emb.alias("v"), emb.alias("v2"))
    sq = F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)
    # unit norm, or EXACTLY zero — empty docs and full sign-hash
    # cancellation (opposite-sign tokens sharing a bucket) both
    # legitimately produce the zero vector
    bad_norm = violations(
        df.select(
            ((F.abs(sq - 1.0) < 1e-9) | (sq == 0.0)).alias("ok")
        ),
        F.col("ok"),
    )
    assert bad_norm == 0
    assert violations(df.select((F.col("v") == F.col("v2")).alias("ok")), F.col("ok")) == 0
    # same normalized text => same vector (join two copies of the corpus)
    a = corpus.select(X.normalize_text(F.col("text")).alias("k"), emb.alias("va"))
    b = corpus.select(X.normalize_text(F.col("text")).alias("k"), emb.alias("vb"))
    assert (
        a.join(b, "k").where(F.col("va") != F.col("vb")).count() == 0
    )


def test_hashed_embedding_agg_path_is_bit_identical(spark):
    """The explode+aggregate scale path must reproduce the per-row
    expression embedding exactly — including empty/whitespace docs,
    which come back as zero vectors."""
    from clickbom_spark.ext.text import hashed_embedding, hashed_embedding_agg

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, ""),
        (4, "   \t  "),
        (5, "Unicode! café naïve 中文 tokens, mixed."),
        (6, "repeat repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string").repartition(3)
    expr = {
        r["doc_id"]: r["vec"]
        for r in df.select(
            "doc_id", hashed_embedding(F.col("text"), dim=16).alias("vec")
        ).collect()
    }
    agg = {
        r["doc_id"]: r["vec"]
        for r in hashed_embedding_agg(df, "text", "doc_id", dim=16).collect()
    }
    assert set(expr) == set(agg)
    for k in expr:
        assert expr[k] == agg[k], (k, expr[k], agg[k])


def test_compression_ratio_matches_local_zlib_and_ranks_repetition(spark):
    import zlib

    from clickbom_spark.ext.text import compression_ratio

    rows = [
        (1, "spam " * 400),                      # highly repetitive
        (2, "The five boxing wizards jump quickly over the lazy dwarf "
            "while quoting Baudelaire and debugging a parser."),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["zratio"]
        for r in compression_ratio(df, "text").collect()
    }
    for i, t in rows:
        if t:
            b = t.encode()
            assert got[i] == len(zlib.compress(b, 6)) / len(b)
    assert got[3] is None and got[4] is None
    assert got[1] < 0.1 < got[2]  # repetition compresses far harder


# ---------------------------------------------------------------------------
# Dialect clause-scanner immunity (hypothesis): the round-9 reviews
# repeatedly found clause-boundary bugs, so pin the invariant
# generatively — a query whose identifiers avoid the handled keyword
# set and whose string literals may CONTAIN any keyword text must
# translate to ITSELF (no clause rewrite, no function mapping, no
# stripped tail).
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

_CLAUSE_WORDS = [
    "SAMPLE", "FINAL", "SETTINGS", "FORMAT", "ASOF", "ANY", "ALL",
    "GLOBAL", "ARRAY", "JOIN", "WITH", "FILL", "TOTALS", "PREWHERE",
    "LIMIT", "BY", "USING", "LEFT", "INNER",
]


def _dialect_reserved():
    from clickbom_spark import dialect as D

    return set(w.lower() for w in _CLAUSE_WORDS) | set(D._PLAIN) | {
        "select", "from", "where", "group", "order", "having",
        "union", "window", "as", "and", "or", "not", "on", "in",
    }


if _HAS_HYP:
    _safe_ident = st.from_regex(
        r"[a-z][a-z0-9_]{0,8}", fullmatch=True
    ).filter(lambda s: s not in _dialect_reserved())
    _lit_text = st.text(
        alphabet=st.sampled_from(
            list(string.ascii_letters + string.digits + " _.,-")
        ),
        min_size=0,
        max_size=30,
    )

    @given(
        cols=st.lists(_safe_ident, min_size=1, max_size=3, unique=True),
        tbl=_safe_ident,
        lit=_lit_text,
        kw=st.sampled_from(_CLAUSE_WORDS),
        kw2=st.sampled_from(_CLAUSE_WORDS),
    )
    @settings(max_examples=120, deadline=None)
    def test_clause_scan_immune_to_keywords_in_literals(
        cols, tbl, lit, kw, kw2
    ):
        from clickbom_spark.dialect import translate_clickhouse_sql

        payload = f"{lit} {kw} 0.5 {kw2}".strip()
        sql = (
            f"SELECT {', '.join(cols)} FROM {tbl} "
            f"WHERE {cols[0]} = '{payload}' ORDER BY {cols[0]}"
        )
        assert translate_clickhouse_sql(sql) == sql

    @given(
        ident=st.sampled_from(
            [w.lower() + "x" for w in _CLAUSE_WORDS]
            + ["x" + w.lower() for w in _CLAUSE_WORDS]
        ),
        tbl=_safe_ident,
    )
    @settings(max_examples=60, deadline=None)
    def test_clause_scan_immune_to_keyword_substrings(ident, tbl):
        """Identifiers that merely CONTAIN a keyword (finalx, xsample)
        never trigger clause machinery."""
        from clickbom_spark.dialect import translate_clickhouse_sql

        sql = f"SELECT {ident} FROM {tbl} ORDER BY {ident}"
        assert translate_clickhouse_sql(sql) == sql
