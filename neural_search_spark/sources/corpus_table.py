"""Corpus source/sink adapters — Iceberg-first, Parquet-fallback.

The engine's input is "an Iceberg table of source-code repositories
with columns (repo, path, commit, lang, content)" (BASELINE.json
input_hint). Everything downstream consumes a plain DataFrame, so the
table format is an adapter concern isolated here:

* ``load_corpus(spark, ref)`` — dispatch on the reference:
    - ``iceberg:<catalog.db.table>`` → the Iceberg Spark catalog
      (``spark.table`` — snapshot isolation, hidden-partition pruning,
      time travel via ``snapshot_id``/``as_of``). Requires the
      iceberg-spark-runtime jar + a configured catalog; detected at
      call time, with a clear error otherwise (the jar is not shipped
      in this environment — the Parquet path exercises the identical
      downstream plan).
    - anything else → a Parquet directory (the driver testdata shape).
* ``write_corpus(df, ref)`` — the mirror sink.
* ``validate_corpus_schema(df)`` — the input_hint contract: all five
  string columns present (extra columns allowed and preserved).

At 10^12-file scale the Iceberg path is the real one: manifests prune
files by partition (e.g. bucket(repo) / lang) before Spark ever lists
them, and the builder's per-segment resume composes with Iceberg
snapshot ids for exactly-once re-ingest (record the snapshot_id in the
index manifest next to build_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ICEBERG_PREFIX = "iceberg:"
CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


class CorpusSourceError(ValueError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def validate_corpus_schema(df: DataFrame) -> DataFrame:
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in CORPUS_COLUMNS if c not in fields]
    if missing:
        raise CorpusSourceError(
            f"corpus is missing required columns {missing} "
            f"(input_hint: {CORPUS_COLUMNS})"
        )
    non_str = [c for c in CORPUS_COLUMNS if not isinstance(fields[c], T.StringType)]
    if non_str:
        raise CorpusSourceError(
            f"corpus columns must be string, got non-string: {non_str}"
        )
    return df


def load_corpus(
    spark: SparkSession,
    ref: str,
    snapshot_id: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """Load the corpus table from an ``iceberg:`` reference or a
    Parquet path. ``snapshot_id`` pins an Iceberg snapshot (time
    travel) — rejected for Parquet sources."""
    if ref.startswith(ICEBERG_PREFIX):
        if not iceberg_available(spark):
            raise CorpusSourceError(
                "Iceberg runtime not on the classpath — add the "
                "iceberg-spark-runtime jar and a catalog config "
                "(spark.sql.catalog.<name>), or pass a Parquet path"
            )
        table = ref[len(ICEBERG_PREFIX):]
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(table)
    else:
        if snapshot_id is not None:
            raise CorpusSourceError("snapshot_id requires an iceberg: source")
        df = spark.read.parquet(ref)
    return validate_corpus_schema(df) if validate else df


def write_corpus(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Write the corpus to an ``iceberg:`` table or a Parquet dir."""
    validate_corpus_schema(df)
    if ref.startswith(ICEBERG_PREFIX):
        if not iceberg_available(df.sparkSession):
            raise CorpusSourceError(
                "Iceberg runtime not on the classpath (see load_corpus)"
            )
        df.writeTo(ref[len(ICEBERG_PREFIX):]).append() if mode == "append" else (
            df.writeTo(ref[len(ICEBERG_PREFIX):]).createOrReplace()
        )
    else:
        df.write.mode(mode if mode != "append" else "append").parquet(ref)
