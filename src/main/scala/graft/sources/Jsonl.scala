package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines ingestion — the de-facto interchange format of training-data
  * pipelines (one document object per line). Mirrors the CSV pipeline's
  * quarantine-not-crash discipline (P16/S3): unparseable lines are split
  * off as data, never an exception.
  *
  * Deliberately NOT `spark.read.json` + `_corrupt_record`: filtering on the
  * datasource's internal corrupt column requires caching the whole input
  * first (Spark raises AnalysisException otherwise), which is a non-starter
  * at 100 TB. Reading as text and parsing with `from_json` gives the same
  * split as a pure codegen'd projection — one scan, no cache, no shuffle.
  * `from_json` in PERMISSIVE mode returns an all-null STRUCT (not a null
  * struct) for malformed input, so corrupt detection goes through an
  * explicit corrupt-record field in the parse schema, which `from_json`
  * populates with the offending text:
  *  - malformed line (bad syntax, or a field that fails conversion) → the
  *    corrupt field carries the raw line → quarantined verbatim;
  *  - a parseable object with MISSING fields yields null fields, not a
  *    corrupt record (schema drift flows to the downstream validity-flag
  *    discipline, same as CSV's null-tolerant casts P12-P14);
  *  - blank lines are dropped (JSONL writers commonly end with one).
  */
object Jsonl {

  /** Read `path` as JSONL against `schema` (which must not contain a `_bad`
    * column). Returns (good, bad): `good` carries the schema's columns;
    * `bad` carries the raw offending line (`line` column) for quarantine
    * sinks.
    */
  def read(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    split(spark.read.text(path), schema)

  /** One split body for batch and stream — only the text source differs. */
  private def split(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_bad"),
      "schema may not contain a '_bad' column (reserved for corrupt capture)")
    val parseSchema = schema.add("_bad", StringType)
    val parsed = raw
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), parseSchema,
          java.util.Map.of("columnNameOfCorruptRecord", "_bad")).as("j"))
    val good = parsed.filter(col("j._bad").isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f")): _*)
    val bad = parsed.filter(col("j._bad").isNotNull).select(col("value").as("line"))
    (good, bad)
  }

  /** Streaming twin of [[read]]: the same schema-enforced split over a
    * file-source stream (new JSONL files drain as micro-batches — the
    * continuous form of a documents landing zone). Same one-projection
    * plan; callers route `good`/`bad` to their own sinks (e.g. parquet
    * append + quarantine dir) under one checkpoint each.
    */
  def readStream(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    split(spark.readStream.text(path), schema)

  /** Write a frame as JSONL (one object per line) — the export twin, used
    * for handing curated corpora to tokenizer/training jobs. Plain
    * `df.write.json` IS JSONL; this wrapper exists so callers find the
    * round-trip next to [[read]] and to pin the compression default
    * (uncompressed — downstream line-oriented consumers expect seekable
    * plain text; pass a codec to override).
    */
  def write(df: DataFrame, path: String, codec: String = "none"): Unit =
    df.write.option("compression", codec).mode("overwrite").json(path)
}
