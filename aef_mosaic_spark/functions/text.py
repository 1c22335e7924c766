"""Text-analysis operators for a training-data pipeline (driver
requirement beyond the reference): language-ID, quality scoring,
token counting, document fingerprinting.

Each builder returns Spark Column expressions (pure built-ins,
whole-stage codegen) and has a matching *_sql twin producing the
identical ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "for"],
    "es": ["el", "la", "los", "que", "por"],
    "fr": ["le", "les", "des", "et", "dans"],
    "de": ["der", "die", "und", "mit", "von"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def token_count_sql(t: str) -> str:
    return f"len(string_split_regex(lower(trim({t})), '\\s+'))"


def _occ_simple_col(text: Column, word: str) -> Column:
    """Whitespace-delimited occurrences of `word`, overlap-safe: double
    every space first so ' a a ' becomes ' a  a ' and non-overlapping
    replace counts every occurrence. Pure string built-ins — the same
    trick is expressible in DuckDB (whose RE2 regex has no lookahead)."""
    p2 = F.replace(
        F.concat(F.lit(" "), F.lower(text), F.lit(" ")), F.lit(" "), F.lit("  ")
    )
    needle = f" {word} "
    removed = F.replace(p2, F.lit(needle), F.lit(""))
    return ((F.length(p2) - F.length(removed)) / F.lit(len(needle))).cast("int")


def _occ_simple_sql(t: str, word: str) -> str:
    p2 = f"replace(' ' || lower({t}) || ' ', ' ', '  ')"
    needle = f" {word} "
    return (f"((length({p2}) - length(replace({p2}, '{needle}', '')))"
            f" / {len(needle)})::INT")


def lang_scores_col(text: Column) -> dict[str, Column]:
    return {
        lang: sum((_occ_simple_col(text, w) for w in ws), F.lit(0))
        for lang, ws in LANG_MARKERS.items()
    }


def lang_scores_sql(t: str) -> dict[str, str]:
    return {
        lang: "(" + " + ".join(_occ_simple_sql(t, w) for w in ws) + ")"
        for lang, ws in LANG_MARKERS.items()
    }


def lang_id_col(text: Column) -> Column:
    """argmax language by marker hits; 'und' when no marker present.
    Ties broken by fixed lexicon order (same CASE chain in SQL)."""
    scores = lang_scores_col(text)
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:  # first-wins on ties via strict >
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best


def lang_id_sql(t: str) -> str:
    scores = lang_scores_sql(t)
    langs = list(LANG_MARKERS)
    best, best_score = "'und'", "0"
    for lang in langs:
        cond = f"({scores[lang]} > {best_score})"
        best = f"(CASE WHEN {cond} THEN '{lang}' ELSE {best} END)"
        best_score = f"(CASE WHEN {cond} THEN {scores[lang]} ELSE {best_score} END)"
    return best


def punct_ratio_col(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return F.round((F.length(text) - F.length(stripped)) /
                   F.greatest(F.length(text), F.lit(1)), 6)


def punct_ratio_sql(t: str) -> str:
    stripped = f"regexp_replace({t}, '[^\\w\\s]', '', 'g')"
    return (f"round((length({t}) - length({stripped}))::DOUBLE / "
            f"greatest(length({t}), 1), 6)")


def stopword_ratio_col(text: Column) -> Column:
    hits = sum((_occ_simple_col(text, w) for w in STOPWORDS), F.lit(0))
    return F.round(hits / F.greatest(token_count_col(text), F.lit(1)), 6)


def stopword_ratio_sql(t: str) -> str:
    hits = "(" + " + ".join(_occ_simple_sql(t, w) for w in STOPWORDS) + ")"
    return f"round({hits}::DOUBLE / greatest({token_count_sql(t)}, 1), 6)"


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation +
    stopword presence (the classic Gopher-style heuristics, public)."""
    n_tok = token_count_col(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio_col(text) <= 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio_col(text) >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + punct_ok + stop_ok, 2)


def quality_score_sql(t: str) -> str:
    n_tok = token_count_sql(t)
    return (
        "round("
        f"(CASE WHEN {n_tok} >= 10 AND {n_tok} <= 5000 THEN 0.4e0 ELSE 0e0 END) + "
        f"(CASE WHEN {punct_ratio_sql(t)} <= 0.2 THEN 0.3e0 ELSE 0e0 END) + "
        f"(CASE WHEN {stopword_ratio_sql(t)} >= 0.01 THEN 0.3e0 ELSE 0e0 END)"
        ", 2)"
    )


def repetition_stats(df, id_col: str, text_col: str):
    """Gopher-style repetition filters (Rae et al. 2021, public) over
    word tokens -> (id, n_tok, distinct_frac, top_tok_frac,
    dup_2gram_frac):

    - distinct_frac: |distinct tokens| / |tokens| (low = repetitive),
    - top_tok_frac:  count of the most frequent token / |tokens|,
    - dup_2gram_frac: 1 - |distinct 2-grams| / |2-grams| (0 when the
      doc has < 2 tokens).

    All JVM Column exprs. The token array is materialized as its own
    projected column BEFORE any lambda touches it (the no-CSE-in-
    lambda rule: Spark re-evaluates a shared subexpression per lambda
    call, turning O(n) into O(n^2)). The top-token count is an
    explode -> two groupBys (combiner-friendly) rather than a
    per-doc sort."""
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    base = df.select(F.col(id_col), toks.alias("_toks"))
    base = base.select(
        F.col(id_col), "_toks",
        F.size("_toks").alias("n_tok"),
        F.size(F.array_distinct("_toks")).alias("_n_dist"))
    grams = F.transform(
        F.sequence(F.lit(1), F.col("n_tok") - 1),
        lambda i: F.concat_ws(" ", F.element_at(F.col("_toks"), i),
                              F.element_at(F.col("_toks"), i + 1)))
    stats = base.select(
        F.col(id_col), F.col("n_tok"),
        F.round(F.col("_n_dist") / F.greatest("n_tok", F.lit(1)), 6)
        .alias("distinct_frac"),
        F.when(F.col("n_tok") < 2, F.lit(0.0)).otherwise(
            F.round(1.0 - F.size(F.array_distinct(grams))
                    / (F.col("n_tok") - 1), 6)).alias("dup_2gram_frac"))
    top = (df.select(F.col(id_col),
                     F.explode(toks).alias("_t"))
           .groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
           .groupBy(id_col).agg(F.max("_c").alias("_top")))
    return (stats.join(top, id_col, "left")
            .select(F.col(id_col), "n_tok", "distinct_frac",
                    F.round(F.coalesce(F.col("_top"), F.lit(0))
                            / F.greatest("n_tok", F.lit(1)), 6)
                    .alias("top_tok_frac"),
                    "dup_2gram_frac"))


def repetition_stats_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of repetition_stats. Lists are CTE-materialized
    before the lambda passes (DuckDB re-evaluates inlined list exprs
    per lambda call)."""
    return f"""
    WITH tl AS MATERIALIZED (
        SELECT {id_col},
               list_filter(string_split_regex(lower(trim({text_col})),
                           '\\s+'), t -> t <> '') AS toks
        FROM {table}),
    b AS MATERIALIZED (
        SELECT {id_col}, toks, len(toks) AS n_tok,
               len(list_distinct(toks)) AS n_dist
        FROM tl),
    g AS (SELECT {id_col}, n_tok, n_dist,
          CASE WHEN n_tok < 2 THEN 0e0 ELSE
            round(1e0 - len(list_distinct(list_transform(
                generate_series(1, n_tok - 1),
                i -> toks[i] || ' ' || toks[i + 1])))::DOUBLE
                / (n_tok - 1), 6) END AS dup_2gram_frac
          FROM b),
    top AS (SELECT {id_col}, max(c) AS top_c FROM (
            SELECT {id_col}, t, count(*) AS c FROM
            (SELECT {id_col}, unnest(toks) AS t FROM tl)
            GROUP BY {id_col}, t) GROUP BY {id_col})
    SELECT g.{id_col} AS {id_col}, n_tok::INT AS n_tok,
           round(n_dist::DOUBLE / greatest(n_tok, 1), 6) AS distinct_frac,
           round(coalesce(top_c, 0)::DOUBLE / greatest(n_tok, 1), 6)
             AS top_tok_frac,
           dup_2gram_frac
    FROM g LEFT JOIN top ON g.{id_col} = top.{id_col}
    """


def fingerprint_col(text: Column) -> Column:
    """Normalized-text md5 fingerprint (lowercase, collapse whitespace,
    strip punctuation) — near-exact dedup key."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " "))
    return F.md5(norm)


def fingerprint_sql(t: str) -> str:
    norm = (f"trim(regexp_replace(regexp_replace(lower({t}), '[^\\w\\s]', '', 'g'),"
            f" '\\s+', ' ', 'g'))")
    return f"md5({norm})"


def winnow_grams_col(text: Column, k: int = 8) -> Column:
    """Hashes of every character k-gram of the normalized text — stage
    one of winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003, the MOSS
    algorithm). MUST be materialized as its own projected column before
    winnow_mins_col consumes it: Spark does no common-subexpression
    elimination inside lambda functions, so inlining this under the
    per-window slice re-hashes the whole document per window position
    (O(n^2) md5 calls — measured 174 s vs 4 s on the gate corpus).

    r6: the normalized text is bound ONCE per row through a 1-element
    array lambda variable — inlined, lower(trim(text)) itself re-ran
    per gram position (O(L^2) character work; the same no-CSE-in-
    lambdas law one level down). Values unchanged."""
    norm = F.lower(F.trim(text))

    def _grams(nm):
        n = F.length(nm)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.conv(F.substring(F.md5(F.substring(nm, i, k)), 1, 8),
                             16, 10).cast("long"),
        )

    return F.element_at(F.transform(F.array(norm), _grams), 1)


def winnow_mins_col(grams: Column, w: int = 4) -> Column:
    """Stage two: distinct per-window minima over a MATERIALIZED gram
    column (w-hash sliding window; the distinct minima are the
    fingerprint set, guaranteed to share one with any document
    overlapping >= k+w-1 characters). Returns array<long>."""
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(grams) - (w - 1), F.lit(1))),
        lambda j: F.array_min(F.slice(grams, j, w)),
    )
    return F.array_distinct(mins)


def winnow_grams_sql(t: str, k: int = 8) -> str:
    """DuckDB k-gram hash list for winnowing. Materialize this as a
    column (CTE) before applying winnow_mins_sql — inlining it into
    the window expression makes DuckDB re-evaluate the whole list per
    window position (O(n^2); measured 367 s vs 14 s on the gate)."""
    norm = f"lower(trim({t}))"
    return (
        f"list_transform(generate_series(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> (('0x' || substr(md5(substr({norm}, i, {k})), 1, 8))::BIGINT))"
    )


def winnow_mins_sql(grams_col: str, w: int = 4) -> str:
    """Distinct per-window minima over a MATERIALIZED gram-list column."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({grams_col}) - {w - 1}, 1)), "
        f"j -> list_min({grams_col}[j : j + {w - 1}])))"
    )


# ---------------------------------------------------------------------
# model-based quality scoring (fixed-weight logistic classifier)
# ---------------------------------------------------------------------
# The model-based complement of the rule-based quality_score_col: a
# linear classifier over document statistics with FIXED public weights
# (the CCNet / fastText-quality-filter shape, Wenzek et al. 2020 —
# weights here are deterministic literals, not a trained artifact, so
# the identical model is embeddable in the Spark plan and the oracle
# SQL). All features are quantized with the cross-engine floor-recipe
# (floor(x*1e6+0.5)/1e6) BEFORE the dot product so both engines feed
# exp() bit-identical inputs.

QC_WEIGHTS = {
    "bias": -3.4,
    "log_tokens": 0.72,     # longer docs score higher (saturating)
    "stopword_ratio": 9.5,  # natural-language marker
    "punct_ratio": -6.0,    # symbol soup scores lower
    "distinct_ratio": 1.8,  # type-token ratio: repetition scores lower
}


def _q6_col(c: Column) -> Column:
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


def _q6_sql(e: str) -> str:
    return f"(floor(({e}) * 1000000 + 0.5e0) / 1000000)"


def quality_classifier_col(text: Column) -> Column:
    """Logistic quality score in (0,1): sigmoid(w . features)."""
    ts = tokens_col(text)
    n_tok = F.greatest(F.size(ts), F.lit(1))
    x_log = _q6_col(F.log(F.lit(1.0) + n_tok))
    x_stop = _q6_col(stopword_ratio_col(text))
    x_punct = _q6_col(punct_ratio_col(text))
    x_dist = _q6_col(F.size(F.array_distinct(ts)) / n_tok)
    w = QC_WEIGHTS
    z = (F.lit(w["bias"]) + F.lit(w["log_tokens"]) * x_log
         + F.lit(w["stopword_ratio"]) * x_stop
         + F.lit(w["punct_ratio"]) * x_punct
         + F.lit(w["distinct_ratio"]) * x_dist)
    return _q6_col(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def quality_classifier_sql(t: str) -> str:
    ts = f"string_split_regex(lower(trim({t})), '\\s+')"
    n_tok = f"greatest(len({ts}), 1)"
    x_log = _q6_sql(f"ln(1e0 + {n_tok})")
    x_stop = _q6_sql(stopword_ratio_sql(t))
    x_punct = _q6_sql(punct_ratio_sql(t))
    x_dist = _q6_sql(f"len(list_distinct({ts}))::DOUBLE / {n_tok}")
    w = QC_WEIGHTS
    z = (f"({w['bias']!r}e0 + {w['log_tokens']!r}e0 * {x_log}"
         f" + {w['stopword_ratio']!r}e0 * {x_stop}"
         f" + {w['punct_ratio']!r}e0 * {x_punct}"
         f" + {w['distinct_ratio']!r}e0 * {x_dist})")
    return _q6_sql(f"1e0 / (1e0 + exp(-{z}))")


# ---------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------
# Training-corpus scrubbing pass: detect and mask emails, NANP-style
# phone numbers, and IPv4 literals. Patterns are RE2-compatible (no
# lookahead/backreference — DuckDB's regex engine is RE2) and applied
# in a fixed order, so Spark's regexp_replace and the oracle's produce
# byte-identical redacted text.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ip", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
]


def pii_count_col(text: Column, kind: str) -> Column:
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(text, F.lit(pat)).cast("int")


def pii_count_sql(t: str, kind: str) -> str:
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return f"len(regexp_extract_all({t}, '{pat}'))::INT"


def pii_redact_col(text: Column) -> Column:
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_redact_sql(t: str) -> str:
    out = t
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


# ---------------------------------------------------------------------
# BPE-ish pre-tokenization count
# ---------------------------------------------------------------------
# The GPT-2 pre-tokenizer pattern shape (Radford et al. 2019, public):
# contractions, optionally-space-prefixed letter runs, digit runs, and
# punctuation runs. The upstream pattern's trailing-space lookahead is
# dropped (RE2 — hence DuckDB — has no lookahead); whitespace itself
# is not counted as a token. This is the "how many tokens will the
# tokenizer roughly see" estimator used for budget math — a real BPE
# merge table would only split these pre-tokens further.

BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
)


def bpe_pretoken_count_col(text: Column) -> Column:
    return F.regexp_count(F.lower(text),
                          F.lit(BPE_PRETOKEN_PATTERN)).cast("int")


def bpe_pretoken_count_sql(t: str) -> str:
    pat = BPE_PRETOKEN_PATTERN.replace("'", "''")  # SQL-literal escape
    return f"len(regexp_extract_all(lower({t}), '{pat}'))::INT"


# the Gopher rule battery (Rae et al. 2021, Appendix A1.1 — public).
# Thresholds are the paper's; stopword list is the paper's 8 words.
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_THRESH = {
    "min_words": 50, "max_words": 100000,
    "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1, "max_bullet_frac": 0.9,
    "max_ellipsis_frac": 0.3, "min_alpha_frac": 0.8,
    "min_stop_hits": 2,
}


def gopher_rules_cols(text: Column) -> dict[str, Column]:
    """The full Gopher quality-rule battery as pure Column exprs
    (whole-stage codegen, zero exchanges): per-doc metrics, one
    boolean per rule, and the conjunction `keep`. Ratios are
    floor-quantized to 6dp BEFORE threshold comparison (the .5-tie
    recipe — round() half-up/half-even differs across engines)."""
    th = GOPHER_THRESH
    words = tokens_col(text)
    n_words = F.size(words)
    nw1 = F.greatest(n_words, F.lit(1))
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    mean_wl = _q6_col(nonspace / nw1)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"),
                                                 F.lit("")))
    n_ell = ((F.length(text)
              - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3) \
        .cast("int")
    symbol_ratio = _q6_col((n_hash + n_ell) / nw1)
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = _q6_col(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        / n_lines)
    ellipsis_frac = _q6_col(
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))) / n_lines)
    alpha_frac = _q6_col(
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / nw1)
    stop_hits = sum(
        (F.when(_occ_simple_col(text, w) > 0, F.lit(1)).otherwise(F.lit(0))
         for w in GOPHER_STOP), F.lit(0))
    m = {
        "n_words": n_words, "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio, "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac, "alpha_frac": alpha_frac,
        "stop_hits": stop_hits.cast("int"),
    }
    rules = {
        "r_words": (n_words >= th["min_words"])
        & (n_words <= th["max_words"]),
        "r_mean_len": (mean_wl >= th["min_mean_word_len"])
        & (mean_wl <= th["max_mean_word_len"]),
        "r_symbol": symbol_ratio <= th["max_symbol_ratio"],
        "r_bullet": bullet_frac <= th["max_bullet_frac"],
        "r_ellipsis": ellipsis_frac <= th["max_ellipsis_frac"],
        "r_alpha": alpha_frac >= th["min_alpha_frac"],
        "r_stop": stop_hits >= th["min_stop_hits"],
    }
    keep = F.lit(True)
    for r in rules.values():
        keep = keep & r
    return {**m, **rules, "keep": keep}


def gopher_rules_sql(t: str) -> dict[str, str]:
    """DuckDB twins of gopher_rules_cols, identical quantization."""
    th = GOPHER_THRESH
    words = f"string_split_regex(lower(trim({t})), '\\s+')"
    n_words = f"len({words})"
    nw1 = f"greatest({n_words}, 1)"
    nonspace = f"length(regexp_replace({t}, '\\s', '', 'g'))"
    mean_wl = _q6_sql(f"{nonspace}::DOUBLE / {nw1}")
    n_hash = f"(length({t}) - length(replace({t}, '#', '')))"
    n_ell = f"((length({t}) - length(replace({t}, '...', ''))) // 3)"
    symbol_ratio = _q6_sql(f"({n_hash} + {n_ell})::DOUBLE / {nw1}")
    lines = f"string_split({t}, chr(10))"
    n_lines = f"greatest(len({lines}), 1)"
    bullet = _q6_sql(
        f"len(list_filter({lines}, l -> regexp_matches(l, "
        f"'^\\s*[-*•]')))::DOUBLE / {n_lines}")
    ellip = _q6_sql(
        f"len(list_filter({lines}, l -> regexp_matches(l, "
        f"'\\.\\.\\.$')))::DOUBLE / {n_lines}")
    alpha = _q6_sql(
        f"len(list_filter({words}, w -> regexp_matches(w, "
        f"'[a-z]')))::DOUBLE / {nw1}")
    stop_hits = "(" + " + ".join(
        f"(CASE WHEN {_occ_simple_sql(t, w)} > 0 THEN 1 ELSE 0 END)"
        for w in GOPHER_STOP) + ")"
    m = {
        "n_words": f"{n_words}::INT",
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet,
        "ellipsis_frac": ellip,
        "alpha_frac": alpha,
        "stop_hits": f"{stop_hits}::INT",
    }
    rules = {
        "r_words": f"({n_words} >= {th['min_words']} AND "
                   f"{n_words} <= {th['max_words']})",
        "r_mean_len": f"({mean_wl} >= {th['min_mean_word_len']!r}e0 AND "
                      f"{mean_wl} <= {th['max_mean_word_len']!r}e0)",
        "r_symbol": f"({symbol_ratio} <= {th['max_symbol_ratio']!r}e0)",
        "r_bullet": f"({bullet} <= {th['max_bullet_frac']!r}e0)",
        "r_ellipsis": f"({ellip} <= {th['max_ellipsis_frac']!r}e0)",
        "r_alpha": f"({alpha} >= {th['min_alpha_frac']!r}e0)",
        "r_stop": f"({stop_hits} >= {th['min_stop_hits']})",
    }
    keep = "(" + " AND ".join(rules.values()) + ")"
    return {**m, **rules, "keep": keep}


def tfidf_keywords(df, id_col: str, text_col: str, k: int = 3):
    """Per-document top-k TF-IDF keywords -> (id, term, tf, score,
    rk) — the classic corpus-analysis / doc-tagging op. Exact-integer
    parity recipe: idf is floor-quantized to 6dp as a BIGINT once per
    term, so score = tf * idf_q is exact integer arithmetic (no
    float-sum ordering anywhere); ties broken by term.

    Scale shape: explode -> groupBy(doc, term) [the only corpus-sized
    exchange] -> term document-frequency agg (vocabulary-sized) joined
    back broadcast -> per-doc top-k window (keys = docs, each tiny)."""
    from pyspark.sql import Window

    dt = (df.select(F.col(id_col),
                    F.explode(tokens_col(F.col(text_col))).alias("term"))
          .groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).cast("int").alias("tf")))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    dfreq = (dt.groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("_df"))
             .crossJoin(F.broadcast(n_docs))
             .select("term", F.floor(
                 F.log((F.col("_n") + 1) / (F.col("_df") + 1))
                 * 1000000 + F.lit(0.5)).cast("long").alias("_idfq")))
    scored = (dt.join(F.broadcast(dfreq), "term")
              .withColumn("_sq", F.col("tf") * F.col("_idfq")))
    w = Window.partitionBy(id_col).orderBy(F.col("_sq").desc(),
                                           F.col("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(id_col, "term", "tf",
                    (F.col("_sq") / 1000000).alias("score"),
                    F.col("rk").cast("int")))


def tfidf_keywords_sql(table: str, id_col: str, text_col: str,
                       k: int = 3) -> str:
    """DuckDB twin: identical tokenization, integer-quantized idf,
    and (score desc, term) tie-break."""
    toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    return f"""
    WITH dt AS (
      SELECT {id_col}, term, count(*)::INT AS tf
      FROM (SELECT {id_col}, unnest({toks}) AS term FROM {table})
      GROUP BY {id_col}, term
    ),
    nd AS (SELECT count(DISTINCT {id_col})::BIGINT AS _n FROM {table}),
    dfreq AS (
      SELECT term,
             CAST(floor(ln((_n + 1)::DOUBLE / (count(*)::BIGINT + 1))
                        * 1000000 + 0.5e0) AS BIGINT) AS _idfq
      FROM dt, nd GROUP BY term, _n
    ),
    scored AS (
      SELECT dt.{id_col}, dt.term, dt.tf,
             (dt.tf * dfreq._idfq)::BIGINT AS _sq
      FROM dt JOIN dfreq USING (term)
    )
    SELECT {id_col}, term, tf, (_sq / 1000000) AS score, rk::INT AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY {id_col} ORDER BY _sq DESC, term) AS rk
          FROM scored)
    WHERE rk <= {k}
    """

def bm25_topk(df, id_col: str, text_col: str, terms: list[str],
              k: int = 20, k1: float = 1.2, b: float = 0.75):
    """BM25 (Robertson/Lucene idf variant) top-k retrieval for a fixed
    query-term set -> (id, n_terms, score, rk) — caption/document
    search over the corpus. Exact-integer parity recipe (the q102
    law): idf and the tf-normalization are each floor-quantized to 6dp
    BIGINTs per (doc, term), so the per-doc score is an integer SUM —
    order-independent across engines; ties broken by id.

    Scale shape: tokenize rides the scan; the exploded stream is
    filtered to the query terms BEFORE the only corpus-sized
    groupBy(doc, term); corpus stats (N, avgdl) and the per-term idf
    table (|terms| rows) are broadcast; final top-k is one window over
    the matched docs only."""
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"),
                     toks.alias("_toks")).select(
        "id", "_toks", F.size("_toks").alias("dl"))
    stats = base.agg(F.count(F.lit(1)).cast("long").alias("_n"),
                     F.sum("dl").cast("long").alias("_sdl"))
    dt = (base.select("id", "dl", F.explode("_toks").alias("term"))
          .where(F.col("term").isin(list(terms)))
          .groupBy("id", "dl", "term")
          .agg(F.count(F.lit(1)).cast("int").alias("tf")))
    idf = (dt.groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("_df"))
           .crossJoin(F.broadcast(stats))
           .select("term", F.floor(F.log(
               (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
               + 1.0) * 1000000 + F.lit(0.5)).cast("long").alias("_idfq"),
               (F.col("_sdl") / F.col("_n")).alias("_avgdl")))
    kk1, kb = float(k1), float(b)
    scored = (dt.join(F.broadcast(idf), "term")
              .withColumn("_tfnq", F.floor(
                  F.col("tf") * (kk1 + 1.0)
                  / (F.col("tf") + kk1 * ((1.0 - kb)
                                          + kb * F.col("dl") / F.col("_avgdl")))
                  * 1000000 + F.lit(0.5)).cast("long"))
              .groupBy("id")
              .agg(F.count(F.lit(1)).cast("int").alias("n_terms"),
                   F.sum(F.col("_idfq") * F.col("_tfnq"))
                   .cast("long").alias("_sq")))
    # top-k FIRST via orderBy+limit -> Catalyst TakeOrderedAndProject
    # (bounded per-partition heaps + one k-row merge); the rank window
    # then runs over k rows only, never a corpus-sized single
    # partition.
    topk = scored.orderBy(F.col("_sq").desc(), F.col("id")).limit(k)
    w = Window.orderBy(F.col("_sq").desc(), F.col("id"))
    return (topk.withColumn("rk", F.row_number().over(w))
            .select(F.col("id").alias(id_col), "n_terms",
                    (F.col("_sq") / F.lit(1000000000000.0)).alias("score"),
                    F.col("rk").cast("int")))


def bm25_topk_sql(table: str, id_col: str, text_col: str,
                  terms: list[str], k: int = 20,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin: identical tokenization, quantization, constants
    (e0-suffixed doubles), and (_sq desc, id) tie-break."""
    toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH base AS (
      SELECT {id_col} AS id, len({toks})::INT AS dl, {toks} AS _toks
      FROM {table}
    ),
    stats AS (SELECT count(*)::BIGINT AS _n, sum(dl)::BIGINT AS _sdl
              FROM base),
    dt AS (
      SELECT id, dl, term, count(*)::INT AS tf
      FROM (SELECT id, dl, unnest(_toks) AS term FROM base)
      WHERE term IN ({term_list})
      GROUP BY id, dl, term
    ),
    idf AS (
      SELECT term,
             CAST(floor(ln((_n - count(*)::BIGINT + 0.5e0)
                           / (count(*)::BIGINT + 0.5e0) + 1.0e0)
                        * 1000000 + 0.5e0) AS BIGINT) AS _idfq,
             (_sdl::DOUBLE / _n) AS _avgdl
      FROM dt, stats GROUP BY term, _n, _sdl
    ),
    scored AS (
      SELECT dt.id, count(*)::INT AS n_terms,
             sum(idf._idfq * CAST(floor(
               dt.tf * {k1 + 1.0}e0
               / (dt.tf + {k1}e0 * ({1.0 - b}e0
                                    + {b}e0 * dt.dl / idf._avgdl))
               * 1000000 + 0.5e0) AS BIGINT))::BIGINT AS _sq
      FROM dt JOIN idf USING (term)
      GROUP BY dt.id
    )
    SELECT id AS {id_col}, n_terms, (_sq / 1000000000000.0e0) AS score,
           rk::INT AS rk
    FROM (SELECT *, row_number() OVER (ORDER BY _sq DESC, id) AS rk
          FROM scored)
    WHERE rk <= {k}
    """
