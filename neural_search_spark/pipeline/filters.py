"""Corpus filtering: the composed keep/drop decision of a training-data
pipeline — quality floor, repetition caps, exact-dup removal, language
allow-list — with a reason code per dropped doc (the standard shape of
published pipelines: C4's rule list, Gopher's quality rules, CCNet's
LM + dedup stages, applied as one pass).

Everything is a join of the engine's existing JVM-side signal
operators on the (uniform) doc key + one CASE — no new shuffles beyond
the signals themselves; at 100 TB each signal is a map-side-combined
aggregate or window the planner already handles, and the composed
filter is where the 90%+ data reduction happens before any expensive
downstream stage (embedding, indexing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_QUALITY = 0.3
DEFAULT_MAX_TOP_BIGRAM = 0.2
DEFAULT_LANGS = ("en", "de", "fr")


def corpus_filter_decisions(
    docs: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    max_top_bigram_frac: float = DEFAULT_MAX_TOP_BIGRAM,
    langs: tuple[str, ...] = DEFAULT_LANGS,
) -> DataFrame:
    """(doc_id, keep, reason): first failing rule wins, checked in the
    cheap-to-expensive order a production pipeline uses —
    exact-dup → language → repetition → quality."""
    from .dedup import exact_dedup
    from .textstats import lang_id, quality_scores, repetition_scores

    dd = exact_dedup(docs).select("doc_id", F.col("keep").alias("not_dup"))
    lg = lang_id(docs).select("doc_id", "lang_pred")
    rep = repetition_scores(docs).select("doc_id", "top_bigram_frac")
    q = quality_scores(docs).select("doc_id", "quality")
    lang_list = ", ".join(f"'{lg_}'" for lg_ in langs)
    reason = F.expr(
        f"CASE WHEN NOT not_dup THEN 'exact_dup' "
        f"WHEN lang_pred NOT IN ({lang_list}) THEN 'lang' "
        f"WHEN top_bigram_frac > {max_top_bigram_frac} THEN 'repetition' "
        f"WHEN quality < {min_quality} THEN 'quality' "
        f"ELSE 'keep' END"
    )
    return (
        dd.join(lg, "doc_id")
        .join(rep, "doc_id")
        .join(q, "doc_id")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "keep")
        .select("doc_id", "keep", "reason")
    )
