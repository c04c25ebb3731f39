"""Text-analysis operators for training-data pipelines.

All pure Catalyst expressions (codegen'd, no UDF): token counting, quality
scoring, n-gram-heuristic language ID, content fingerprinting.  At 100 TB
these run as map-only stages fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in"]

# marker words per language for the n-gram-heuristic language id
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "die", "und"],
}


def tokens_col(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_calc"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality: token count, mean token length, stopword ratio,
    type-token ratio, and a combined [0,1] score.

    Mirrors the shape of public quality filters (C4/Gopher rules): length
    bounds + stopword presence + lexical diversity.
    """
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    n_stop = F.expr(
        f"size(filter(split(lower(trim({text_col})), '\\\\s+'), t -> t IN ({stop_arr})))"
    )
    n_unique = F.size(F.array_distinct(toks))
    # Pure rational per-row arithmetic — bit-deterministic across engines, so
    # no rounding (rounding would itself introduce half-boundary divergence).
    mean_tok_len = (
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("double") / n_tok
    )
    stop_ratio = n_stop.cast("double") / n_tok
    ttr = n_unique.cast("double") / n_tok
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.25
        + ttr * 0.25
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word-vote language ID.  Returns per-language vote counts and
    the argmax (ties broken by language code order)."""
    toks = tokens_col(text_col)
    votes = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }
    # argmax via greatest + chained when (deterministic tie order: en,fr,es,de)
    pred = F.lit("unknown")
    best = F.greatest(*votes.values())
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((votes[lang] > 0) & (votes[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    cols = [F.col(id_col)]
    cols += [votes[lang].alias(f"votes_{lang}") for lang in LANG_MARKERS]
    cols.append(pred.alias("lang_pred"))
    return df.select(*cols)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over the normalized text (lowercased,
    non-alphanumerics stripped) — stable under whitespace/punct noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("n_norm_chars"),
    )
