package graft.queries

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Merge, Prepare, Validate}

/** Reference-parity queries (SURVEY.md §2.1-2.5), executed over the
  * deterministic [[VisitsView]] synthesis of `events`. Every query has a
  * DuckDB oracle; every query ends in a total ORDER BY so the driver's
  * hash compare is row-order stable.
  */
object ParityQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def withCtes(body: String, ctes: String*): String =
    ctes.mkString("WITH ", ",\n", "\n") + body

  // ---- shared Spark-side building blocks ------------------------------------

  def flagged(spark: SparkSession, dir: String): DataFrame =
    Validate.withValidityFlags(VisitsView.df(spark, dir))

  /** Valid rows through P11 null-normalize → P2 rename → P12-14 casts. */
  def prepared(spark: SparkSession, dir: String): DataFrame = {
    val ok = flagged(spark, dir).filter(col("is_valid"))
    val normCols = Seq("email", "jyv", "Fecha envio", "Fecha open", "Fecha click", "Opens", "Clicks")
    val typed = Prepare.enforceTypes(
      Prepare.renameColumns(Prepare.normalizeNulls(ok, normCols)),
      strCols = Seq("email", "jyv"),
      dateCols = Seq("fechaEnvio", "fechaOpen", "fechaClick"),
      intCols = Seq("opens", "clicks"))
    typed.select("event_id", "nombreArchivo", "email", "jyv",
      "fechaEnvio", "fechaOpen", "fechaClick", "opens", "clicks")
  }

  /** Invalid rows exploded to one row per failed check (G1). */
  def errores(spark: SparkSession, dir: String): DataFrame =
    Prepare.explodeErrors(flagged(spark, dir).filter(!col("is_valid")))
      .select("event_id", "nombreArchivo", "email", "tipoError")

  /** DuckDB CTE equivalent of [[prepared]]. */
  private def nullify(c: String) = s"""CASE WHEN "$c" IN ('-','0') THEN NULL ELSE "$c" END"""
  val preparedCte: String =
    s"""prepared AS (
       |  SELECT event_id, "nombreArchivo",
       |    trim(${nullify("email")}) AS email,
       |    trim(${nullify("jyv")}) AS jyv,
       |    try_strptime(trim(${nullify("Fecha envio")}), '%d/%m/%Y %H:%M') AS "fechaEnvio",
       |    try_strptime(trim(${nullify("Fecha open")}), '%d/%m/%Y %H:%M') AS "fechaOpen",
       |    try_strptime(trim(${nullify("Fecha click")}), '%d/%m/%Y %H:%M') AS "fechaClick",
       |    TRY_CAST(trim(${nullify("Opens")}) AS INTEGER) AS opens,
       |    TRY_CAST(trim(${nullify("Clicks")}) AS INTEGER) AS clicks
       |  FROM flagged2 WHERE is_valid
       |)""".stripMargin

  val erroresCte: String =
    """errores AS (
      |  SELECT event_id, "nombreArchivo", email,
      |    unnest(list_filter([
      |      CASE WHEN NOT valid_email THEN 'Email' END,
      |      CASE WHEN NOT "valid_Fecha envio" THEN 'Fecha envio' END,
      |      CASE WHEN NOT "valid_Fecha open" THEN 'Fecha open' END,
      |      CASE WHEN NOT "valid_Fecha click" THEN 'Fecha click' END
      |    ], x -> x IS NOT NULL)) AS "tipoError"
      |  FROM flagged2 WHERE NOT is_valid
      |)""".stripMargin

  private val v = VisitsView.cte
  private val f = VisitsView.flaggedCte

  /** DuckDB equivalent of [[Prepare.visitantes]] over `prepared`. */
  val visitantesSelect: String =
    """SELECT email,
      |  CAST(COUNT(*) AS INTEGER) AS "visitasTotales",
      |  CAST(COUNT(*) AS INTEGER) AS "visitasAnioActual",
      |  CAST(COUNT(*) AS INTEGER) AS "visitasMesActual",
      |  CAST(MIN("fechaEnvio") AS DATE) AS "fechaPrimeraVisita",
      |  CAST(MAX("fechaEnvio") AS DATE) AS "fechaUltimaVisita"
      |FROM prepared GROUP BY email""".stripMargin

  // ---- the registry ---------------------------------------------------------

  val queries: Map[String, QFn] = Registry.uniqueMap[QFn]("ParityQueries.queries")(
    "p1_projection" -> ((s, d) =>
      VisitsView.df(s, d).select("event_id", "nombreArchivo", "email").orderBy("event_id")),

    "p2_rename" -> ((s, d) =>
      graft.Tables.lineitem(s, d)
        .withColumnsRenamed(Map("l_orderkey" -> "orderkey", "l_linenumber" -> "linenumber",
          "l_quantity" -> "qty"))
        .select("orderkey", "linenumber", "qty")
        .orderBy("orderkey", "linenumber")),

    "p4_p6_validity_flags" -> ((s, d) =>
      flagged(s, d).select(col("event_id"), col("valid_email"),
        col("`valid_Fecha envio`"), col("`valid_Fecha open`"), col("`valid_Fecha click`"),
        col("valid_dates"), col("is_valid")).orderBy("event_id")),

    "p7_filter_valid" -> ((s, d) =>
      flagged(s, d).filter(col("is_valid")).select("event_id", "email").orderBy("event_id")),

    "p8_filter_invalid" -> ((s, d) =>
      flagged(s, d).filter(!col("is_valid")).select("event_id", "email").orderBy("event_id")),

    "p11_null_normalize" -> ((s, d) =>
      Prepare.normalizeNulls(VisitsView.df(s, d), Seq("Opens", "Clicks"))
        .select(col("event_id"), col("Opens").as("opens_norm"), col("Clicks").as("clicks_norm"))
        .orderBy("event_id")),

    "p12_p14_casts" -> ((s, d) =>
      prepared(s, d).select(col("event_id"),
        unix_timestamp(col("fechaEnvio")).as("envio_epoch"),
        unix_timestamp(col("fechaOpen")).as("open_epoch"),
        unix_timestamp(col("fechaClick")).as("click_epoch"),
        col("opens"), col("clicks")).orderBy("event_id")),

    "est_estadisticas" -> ((s, d) =>
      prepared(s, d).select(col("event_id"), col("nombreArchivo"), col("email"), col("jyv"),
        unix_timestamp(col("fechaEnvio")).as("envio_epoch"),
        col("opens"), col("clicks")).orderBy("event_id")),

    "g1_error_explode" -> ((s, d) => errores(s, d).orderBy("event_id", "tipoError")),

    "a1_visitantes" -> ((s, d) => Prepare.visitantes(prepared(s, d)).orderBy("email")),

    "a2_validation_rates" -> ((s, d) =>
      flagged(s, d).agg(
        count(lit(1)).as("total"),
        sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_rows"),
        sum(when(!col("is_valid"), 1L).otherwise(0L)).as("invalid_rows"),
        round(sum(when(col("is_valid"), 1L).otherwise(0L)) * lit(100.0) / count(lit(1)), 4)
          .as("pct_valid"))),

    "a3_bitacora" -> ((s, d) =>
      Prepare.bitacoraFromFlags(flagged(s, d)).orderBy("nombreArchivo")),

    "j1_visitantes_merge" -> ((s, d) => {
      val p = prepared(s, d)
      val tgt = Prepare.visitantes(p.filter(col("event_id") % 2 === 0))
      val dlt = Prepare.visitantes(p.filter(col("event_id") % 2 === 1))
      Merge.mergeVisitantes(tgt, dlt, Date.valueOf("2024-02-15")).orderBy("email")
    }))

  // ---- oracles --------------------------------------------------------------

  val oracleSql: Map[String, String] = Registry.uniqueMap[String]("ParityQueries.oracleSql")(
    "p1_projection" -> withCtes(
      """SELECT event_id, "nombreArchivo", email FROM visits ORDER BY event_id""", v),

    "p2_rename" ->
      """SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, l_quantity AS qty
        |FROM lineitem ORDER BY orderkey, linenumber""".stripMargin,

    "p4_p6_validity_flags" -> withCtes(
      """SELECT event_id, valid_email, "valid_Fecha envio", "valid_Fecha open",
        |  "valid_Fecha click", valid_dates, is_valid
        |FROM flagged2 ORDER BY event_id""".stripMargin, v, f),

    "p7_filter_valid" -> withCtes(
      "SELECT event_id, email FROM flagged2 WHERE is_valid ORDER BY event_id", v, f),

    "p8_filter_invalid" -> withCtes(
      "SELECT event_id, email FROM flagged2 WHERE NOT is_valid ORDER BY event_id", v, f),

    "p11_null_normalize" -> withCtes(
      s"""SELECT event_id, ${nullify("Opens")} AS opens_norm, ${nullify("Clicks")} AS clicks_norm
         |FROM visits ORDER BY event_id""".stripMargin, v),

    "p12_p14_casts" -> withCtes(
      """SELECT event_id,
        |  CAST(epoch("fechaEnvio") AS BIGINT) AS envio_epoch,
        |  CAST(epoch("fechaOpen") AS BIGINT) AS open_epoch,
        |  CAST(epoch("fechaClick") AS BIGINT) AS click_epoch,
        |  opens, clicks
        |FROM prepared ORDER BY event_id""".stripMargin, v, f, preparedCte),

    "est_estadisticas" -> withCtes(
      """SELECT event_id, "nombreArchivo", email, jyv,
        |  CAST(epoch("fechaEnvio") AS BIGINT) AS envio_epoch, opens, clicks
        |FROM prepared ORDER BY event_id""".stripMargin, v, f, preparedCte),

    "g1_error_explode" -> withCtes(
      """SELECT * FROM errores ORDER BY event_id, "tipoError"""", v, f, erroresCte),

    "a1_visitantes" -> withCtes(visitantesSelect + " ORDER BY email", v, f, preparedCte),

    "a2_validation_rates" -> withCtes(
      """SELECT COUNT(*) AS total,
        |  CAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS valid_rows,
        |  CAST(SUM(CASE WHEN NOT is_valid THEN 1 ELSE 0 END) AS BIGINT) AS invalid_rows,
        |  ROUND(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4) AS pct_valid
        |FROM flagged2""".stripMargin, v, f),

    "a3_bitacora" -> withCtes(
      """SELECT COALESCE(ok."nombreArchivo", err."nombreArchivo") AS "nombreArchivo",
        |  COALESCE(ok.n, 0) AS "registrosExitosos",
        |  COALESCE(err.n, 0) AS "registrosFallidos",
        |  CASE WHEN COALESCE(err.n, 0) > 0 THEN 'Completado con errores'
        |       ELSE 'Completado' END AS estatus
        |FROM (SELECT "nombreArchivo", COUNT(*) AS n FROM flagged2 WHERE is_valid GROUP BY 1) ok
        |FULL OUTER JOIN (SELECT "nombreArchivo", COUNT(*) AS n FROM errores GROUP BY 1) err
        |  ON ok."nombreArchivo" = err."nombreArchivo"
        |ORDER BY "nombreArchivo"""".stripMargin, v, f, erroresCte),

    "j1_visitantes_merge" -> withCtes(
      s"""SELECT
         |  COALESCE(t.email, s.email) AS email,
         |  CASE WHEN t.email IS NOT NULL AND s.email IS NOT NULL THEN t."fechaPrimeraVisita"
         |  ELSE COALESCE(t."fechaPrimeraVisita", s."fechaPrimeraVisita") END AS "fechaPrimeraVisita",
         |  CASE WHEN t.email IS NOT NULL AND s.email IS NOT NULL THEN
         |    greatest(t."fechaUltimaVisita", s."fechaUltimaVisita")
         |  ELSE COALESCE(t."fechaUltimaVisita", s."fechaUltimaVisita") END AS "fechaUltimaVisita",
         |  CASE WHEN t.email IS NOT NULL AND s.email IS NOT NULL THEN
         |    t."visitasTotales" + s."visitasTotales"
         |  ELSE COALESCE(t."visitasTotales", s."visitasTotales") END AS "visitasTotales",
         |  CASE WHEN t.email IS NOT NULL AND s.email IS NOT NULL THEN
         |    (CASE WHEN EXTRACT(YEAR FROM t."fechaUltimaVisita") = 2024
         |          THEN t."visitasAnioActual" + s."visitasAnioActual"
         |          ELSE s."visitasAnioActual" END)
         |  ELSE COALESCE(t."visitasAnioActual", s."visitasAnioActual") END AS "visitasAnioActual",
         |  CASE WHEN t.email IS NOT NULL AND s.email IS NOT NULL THEN
         |    (CASE WHEN EXTRACT(YEAR FROM t."fechaUltimaVisita") = 2024
         |           AND EXTRACT(MONTH FROM t."fechaUltimaVisita") = EXTRACT(MONTH FROM s."fechaUltimaVisita")
         |          THEN t."visitasMesActual" + s."visitasMesActual"
         |          ELSE s."visitasMesActual" END)
         |  ELSE COALESCE(t."visitasMesActual", s."visitasMesActual") END AS "visitasMesActual"
         |FROM (SELECT * FROM tgt) t FULL OUTER JOIN (SELECT * FROM dlt) s ON t.email = s.email
         |ORDER BY email""".stripMargin,
      v, f, preparedCte,
      s"""tgt AS ($visitantesSelect0 WHERE event_id % 2 = 0 GROUP BY email)""",
      s"""dlt AS ($visitantesSelect0 WHERE event_id % 2 = 1 GROUP BY email)"""))

  /** visitantes select without its GROUP BY, for filtered variants. */
  private lazy val visitantesSelect0: String =
    """SELECT email,
      |  CAST(COUNT(*) AS INTEGER) AS "visitasTotales",
      |  CAST(COUNT(*) AS INTEGER) AS "visitasAnioActual",
      |  CAST(COUNT(*) AS INTEGER) AS "visitasMesActual",
      |  CAST(MIN("fechaEnvio") AS DATE) AS "fechaPrimeraVisita",
      |  CAST(MAX("fechaEnvio") AS DATE) AS "fechaUltimaVisita"
      |FROM prepared""".stripMargin
}
