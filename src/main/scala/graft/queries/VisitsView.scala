package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic synthesis of the reference's visits-file layout from the
  * driver's `events` table (FIXTURES.md §B mapping: user_id ≈ email key,
  * ts ≈ fecha). The SAME derivation is declared twice — once as Spark
  * expressions ([[df]]) and once as a DuckDB CTE ([[cte]]) — so every parity
  * query can be oracle-checked end to end. Invalid values are injected on
  * fixed event_id residues; CASE arm order is part of the contract and must
  * stay identical on both sides.
  *
  * Columns mirror the reference layout subset exercised by the t2 queries:
  * nombreArchivo (4 pseudo-files), email, jyv, "Fecha envio", "Fecha open",
  * "Fecha click", Opens, Clicks — all raw strings, as read from a file.
  */
object VisitsView {

  def df(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_id"),
      concat(lit("report_"), (col("event_id") % 4).cast("string"), lit(".txt")).as("nombreArchivo"),
      when(col("event_id") % 29 === 0, lit(null))
        .when(col("event_id") % 13 === 0, lit("bad email@@"))
        .otherwise(concat(lit("user"), col("user_id").cast("string"), lit("@example.com")))
        .as("email"),
      col("event_type").as("jyv"),
      when(col("event_id") % 17 === 0, lit("99/99/2024 10:00"))
        .otherwise(date_format(col("ts"), "dd/MM/yyyy HH:mm"))
        .as("Fecha envio"),
      when(col("event_id") % 23 === 0, lit("15/13/2024 10:00"))
        .when(col("event_id") % 5 === 0, lit(null))
        .otherwise(date_format(col("ts") + expr("INTERVAL 1 HOUR"), "dd/MM/yyyy HH:mm"))
        .as("Fecha open"),
      when(col("event_id") % 31 === 0, lit("00/01/2024 10:00"))
        .when(col("event_id") % 3 === 0, date_format(col("ts") + expr("INTERVAL 2 HOUR"), "dd/MM/yyyy HH:mm"))
        .otherwise(lit(null))
        .as("Fecha click"),
      when(col("event_id") % 7 === 0, lit("-"))
        .when(col("event_id") % 4 === 0, lit("0"))
        .otherwise(floor(col("value")).cast("string"))
        .as("Opens"),
      when(col("event_id") % 9 === 0, lit("-"))
        .otherwise((col("event_id") % 50).cast("string"))
        .as("Clicks"))
  }

  /** DuckDB CTE body producing byte-identical rows to [[df]]. */
  val cte: String =
    """visits AS (
      |  SELECT
      |    event_id,
      |    'report_' || CAST(event_id % 4 AS VARCHAR) || '.txt' AS "nombreArchivo",
      |    CASE WHEN event_id % 29 = 0 THEN NULL
      |         WHEN event_id % 13 = 0 THEN 'bad email@@'
      |         ELSE 'user' || CAST(user_id AS VARCHAR) || '@example.com' END AS email,
      |    event_type AS jyv,
      |    CASE WHEN event_id % 17 = 0 THEN '99/99/2024 10:00'
      |         ELSE strftime(ts, '%d/%m/%Y %H:%M') END AS "Fecha envio",
      |    CASE WHEN event_id % 23 = 0 THEN '15/13/2024 10:00'
      |         WHEN event_id % 5 = 0 THEN NULL
      |         ELSE strftime(ts + INTERVAL 1 HOUR, '%d/%m/%Y %H:%M') END AS "Fecha open",
      |    CASE WHEN event_id % 31 = 0 THEN '00/01/2024 10:00'
      |         WHEN event_id % 3 = 0 THEN strftime(ts + INTERVAL 2 HOUR, '%d/%m/%Y %H:%M')
      |         ELSE NULL END AS "Fecha click",
      |    CASE WHEN event_id % 7 = 0 THEN '-'
      |         WHEN event_id % 4 = 0 THEN '0'
      |         ELSE CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR) END AS "Opens",
      |    CASE WHEN event_id % 9 = 0 THEN '-'
      |         ELSE CAST(event_id % 50 AS VARCHAR) END AS "Clicks"
      |  FROM events
      |)""".stripMargin

  /** DuckDB CTE adding the reference's validity flags (P4-P6) on top of
    * `visits` — mirror of [[graft.operators.Validate.withValidityFlags]].
    */
  val flaggedCte: String = {
    val emailRe = graft.operators.Layout.emailRegex
    val dateRe = graft.operators.Layout.dateRegex
    def validDate(c: String) =
      s"""("$c" IS NULL OR (trim("$c") <> '' AND regexp_matches(trim("$c"), '$dateRe'))) AS "valid_$c""""
    s"""flagged AS (
       |  SELECT *,
       |    (email IS NOT NULL AND trim(email) <> '' AND regexp_matches(trim(email), '$emailRe')) AS valid_email,
       |    ${validDate("Fecha envio")},
       |    ${validDate("Fecha open")},
       |    ${validDate("Fecha click")}
       |  FROM visits
       |),
       |flagged2 AS (
       |  SELECT *,
       |    ("valid_Fecha envio" AND "valid_Fecha open" AND "valid_Fecha click") AS valid_dates,
       |    (valid_email AND "valid_Fecha envio" AND "valid_Fecha open" AND "valid_Fecha click") AS is_valid
       |  FROM flagged
       |)""".stripMargin
  }
}
