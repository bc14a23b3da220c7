"""Text analysis operators over a document table (north star).

All pure Column expressions (JVM-side, whole-stage codegen) — language
ID, quality scoring, token counting, fingerprinting.  Heuristics are
deliberately simple and *portable* (the DuckDB oracle reproduces them),
which is exactly what you want at 100 TB: a cheap first-pass filter
before any model-based scoring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny distinctive-stopword lists per language for the n-gram/stopword
# language-ID heuristic.  Order matters: ties break by list order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],  # pinyin-ish markers
}

PUNCT_CLASS = r"[.,!?;:]"


def ws_trim(col: Column | str) -> Column:
    """Trim ALL leading/trailing whitespace.  ``F.trim`` strips spaces
    only, so tab/newline-padded text slipped past the empty guard and
    ``split`` emitted phantom '' tokens (tokens('\\t') was 2 — caught
    by the Python ground-truth property test, with the DuckDB oracle
    mirroring the same wrong answer via SQL ``trim``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; ''/whitespace-only ->
    empty array."""
    c = F.col(col) if isinstance(col, str) else col
    t = ws_trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token-count proxy for BPE vocabularies: whitespace tokens plus
    one extra piece per punctuation mark (a BPE splits those off).
    Pure arithmetic — cheap, portable (no lookahead regex, which RE2
    lacks), good enough for length filtering."""
    c = F.col(col) if isinstance(col, str) else col
    return token_count(c) + punct_count(c)


def marker_hits(col: Column | str, markers: list[str]) -> Column:
    toks = tokens(col)
    arr = F.array([F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: marker_hits(col, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Predicted language = argmax of marker hits (first-listed wins
    ties); fewer than ``min_hits`` -> 'und'.

    Single-Column convenience form: tokenization is re-inlined by
    CollapseProject into every per-language score (L+ evaluations per
    row).  For the hot path use :func:`lang_scores_on_tokens` +
    :func:`lang_pred_from_scores` across staged selects (see
    plans' text_lang_id) — tokens and scores each evaluate once."""
    scores = lang_scores(col)
    return lang_pred_from_scores(scores, min_hits)


def lang_scores_on_tokens(toks_lower: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over an ALREADY-lowered token
    array column (evaluate ``transform(tokens(c), lower)`` once in a
    prior select so the tokenization isn't re-inlined per language)."""
    return {
        lang: F.size(
            F.filter(
                toks_lower,
                lambda t: F.array_contains(F.array([F.lit(m) for m in ms]), t),
            )
        )
        for lang, ms in LANG_MARKERS.items()
    }


def lang_pred_from_scores(scores: dict[str, Column], min_hits: int = 1) -> Column:
    """Argmax over per-language score columns (first-listed wins ties);
    fewer than ``min_hits`` total -> 'und'."""
    langs = list(scores)
    best = F.greatest(*[scores[lg] for lg in langs]) if len(langs) > 1 else scores[langs[0]]
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    return F.when(best >= min_hits, pred).otherwise(F.lit("und"))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def quality_features(col: Column | str) -> dict[str, Column]:
    """The standard cheap quality signals: length, token stats,
    punctuation ratio, lexical diversity (uniq/total tokens), stopword
    ratio.  Deterministic integer/double arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    uniq = F.size(F.array_distinct(F.transform(toks, F.lower))).cast("double")
    stop = marker_hits(c, LANG_MARKERS["en"]).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, punct_count(c).cast("double") / n_chars).otherwise(F.lit(0.0)),
        "lexical_diversity": F.when(n_tok > 0, uniq / n_tok).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column | str) -> Column:
    """Composite in [0,1]: rewards mid-length docs with diverse tokens
    and some (but not excessive) stopwords/punctuation."""
    f = quality_features(col)
    len_score = F.least(f["n_tokens"] / F.lit(64.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * f["lexical_diversity"]
        + F.lit(0.2) * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(f["punct_ratio"] * 10, F.lit(1.0)))
    )


def normalize_text(col: Column | str) -> Column:
    """Fingerprint normalization: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of normalized text.  Identical docs
    (modulo case/whitespace) collide — the exact-dedup key."""
    return F.md5(normalize_text(col))


def chunk_token_windows(
    df,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 16,
    carry: tuple[str, ...] = (),
):
    """Split documents into overlapping token windows — the
    context-window packing step of an LLM data pipeline.  One chunk
    starts every ``stride`` tokens; each spans up to ``size`` tokens
    (the trailing chunk may be shorter).  Zero-token docs emit nothing.
    ``carry`` names extra doc-level columns passed through to every
    chunk row (lang, source, ...).

    Pure codegen (split/sequence/slice/array_join + one explode): the
    output is ~size/stride× the token volume of the corpus, produced
    map-side with no shuffle — at 100 TB this pipelines straight into
    the next stage (tokenize/pack) without a repartition.
    """
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    base = (
        df.select(F.col(id_col), *[F.col(c) for c in carry], toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride))
    return (
        base.select(
            id_col, *carry, "__toks", "__n", F.posexplode(starts).alias("chunk_idx", "__start")
        )
        .withColumn("__chunk", F.slice("__toks", F.col("__start") + 1, size))
        .select(
            id_col,
            *carry,
            F.col("chunk_idx").cast("long"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def repetition_metrics(df, id_col: str, text_col: str, max_n: int = 3):
    """Within-doc repetition quality signals (the Gopher-filter family,
    Rae et al. 2021 §A1.1): per doc, the fraction of tokens claimed by
    the most frequent token / bigram and the fraction of trigram
    occurrences that are repeats.  Boilerplate, keyword-stuffed, and
    looping generated text score high; clean prose scores low.

    Shape: ONE explode emits (doc, n, gram) rows for n = 1..max_n
    (grams built per-row with slice+array_join — no window, no
    pre-explode shuffle), then two hash aggregations — (doc, n, gram)
    counts, then per-(doc, n) totals — both map-side-combinable; the
    final per-doc pivot is a third key-bounded aggregation.  Every
    stage keys on the doc id, so skew is bounded by document length,
    not corpus size.
    """
    from pipeline311_spark.ext.hashing import ensure_parallelism

    toks = tokens(normalize_text(text_col))
    d = ensure_parallelism(df.select(F.col(id_col).alias("doc"), toks.alias("tk")))

    def gram_structs(n: int) -> Column:
        if n == 1:
            mk = lambda i: F.element_at(F.col("tk"), i)  # noqa: E731
        else:
            mk = lambda i: F.array_join(F.slice(F.col("tk"), i, n), " ")  # noqa: E731
        return F.when(
            F.size("tk") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - n + 1),
                lambda i: F.struct(F.lit(n).alias("n"), mk(i).alias("g")),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    allgrams = F.concat(*[gram_structs(n) for n in range(1, max_n + 1)])
    ex = d.select("doc", F.explode(allgrams).alias("x")).select(
        "doc", F.col("x.n").alias("n"), F.col("x.g").alias("g")
    )
    counts = ex.groupBy("doc", "n", "g").agg(F.count("*").alias("c"))
    per_n = counts.groupBy("doc", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("mx"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)).alias("dup"),
    )
    pick = lambda n, c: F.max(F.when(F.col("n") == n, c))  # noqa: E731
    return per_n.groupBy("doc").agg(
        pick(1, F.col("total")).cast("long").alias("n_tokens"),
        pick(1, F.col("mx") / F.col("total")).alias("top_token_frac"),
        pick(2, F.col("mx") / F.col("total")).alias("top_bigram_frac"),
        pick(3, F.col("dup") / F.col("total")).alias("dup_trigram_frac"),
    ).withColumnRenamed("doc", id_col)


def remove_boilerplate_lines(
    df,
    id_col: str,
    text_col: str,
    max_df: int = 2,
    min_chars: int = 5,
):
    """Cross-document boilerplate LINE removal (the C4/RefinedWeb
    curation step): a line whose normalized form (lower + trim)
    appears in more than ``max_df`` DISTINCT documents is navigation /
    header / footer boilerplate and is dropped from every document;
    surviving lines are reassembled in original order.  Lines shorter
    than ``min_chars`` after normalization never count toward (or get
    dropped by) the frequency gate — short separators are content, not
    boilerplate.

    Plan shape at 100 TB: one explode of lines (scan-side), document
    frequency via per-doc-DISTINCT collapse then a count on the line
    key (the same df-gate shape as the n-gram ``max_df``), a LEFT ANTI
    join against the (small — boilerplate is by definition the heavy
    tail) drop set, and one groupBy(doc) to reassemble.  Docs whose
    every line was dropped survive with empty text (LEFT join back to
    the corpus), NULL-text docs emit no row (the registry NULL-text
    convention).  Returns (id, n_lines, n_kept, clean_text).
    """
    lines = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
        )
        .withColumn("__norm", F.lower(F.trim("__line")))
    )
    drop = (
        lines.filter(F.length("__norm") >= min_chars)
        .select("__id", "__norm")
        .distinct()
        .groupBy("__norm")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__norm")
    )
    kept = lines.join(F.broadcast(drop), "__norm", "left_anti")
    reassembled = kept.groupBy("__id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("clean_text"),
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return (
        base.join(reassembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
