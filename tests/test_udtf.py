"""Python UDTF surface (SURVEY §2.11): a table-valued chunker must
produce exactly the rows of the expression-based passage_chunks —
demonstrating the UDTF escape hatch while proving the JVM path is the
same operator."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from clickbom_spark.ext import text as X
from clickbom_spark.session import read_table
from tests.conftest import SF_SMOKE

SIZE, STRIDE = 64, 48


@udtf(returnType="passage_idx int, passage string")
class ChunkDoc:
    def eval(self, text: str):
        t = re.sub(
            r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", (text or "").lower())
        ).strip()
        toks = [w for w in t.split(" ") if w]
        n = len(toks)
        last_start = max(-(-(n - SIZE) // STRIDE), 0)  # ceil div, min 0
        for c in range(last_start + 1):
            yield c, " ".join(toks[c * STRIDE : c * STRIDE + SIZE])


def test_udtf_matches_expression_chunker(spark):
    docs = read_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 30)
    docs.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register("chunk_doc", ChunkDoc)

    via_udtf = spark.sql(
        """
        SELECT doc_id, c.passage_idx, c.passage
        FROM docs_for_udtf, LATERAL chunk_doc(text) c
        """
    )
    via_expr = docs.select(
        "doc_id",
        F.posexplode(X.passage_chunks(F.col("text"), SIZE, STRIDE)).alias(
            "passage_idx", "passage"
        ),
    )
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in via_expr.collect()}
    assert a == b and len(a) > 0


def test_udtf_standalone_invocation(spark):
    out = ChunkDoc(lit("one two three")).collect()
    assert [(r["passage_idx"], r["passage"]) for r in out] == [(0, "one two three")]
