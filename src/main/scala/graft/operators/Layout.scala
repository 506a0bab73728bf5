package graft.operators

import org.apache.spark.sql.types._

/** The reference's fixed 15-column file layout and validation constants.
  *
  * Sources (reference = /root/reference):
  *  - column list `VALID_COLUMNS`: utils/utils_transform.py:10-15
  *  - rename map `COLUMNS_TO_MAP`: utils/utils_transform.py:26-42
  *  - declared dtypes `COLUMNS_DATA_TYPES`: utils/utils_transform.py:45-61
  *  - email regex: utils/utils_transform.py:111
  *  - date regex (`dd/MM/yyyy HH:mm`, shape-only): utils/utils_transform.py:120
  *
  * All columns are read as STRING first: the reference validates raw string
  * values *before* any cast (utils/utils_transform.py:104-191 happens before
  * the casts at 211-222), so bad values must survive parsing into validation.
  */
object Layout {

  /** Input columns, in file order. */
  val validColumns: Seq[String] = Seq(
    "email", "jyv", "Badmail", "Baja",
    "Fecha envio", "Fecha open", "Opens", "Opens virales",
    "Fecha click", "Clicks", "Clicks virales", "Links",
    "IPs", "Navegadores", "Plataformas")

  /** Date-typed columns (validated by shape regex, null allowed). */
  val dateColumns: Seq[String] = Seq("Fecha envio", "Fecha open", "Fecha click")

  /** Count columns coerced to nullable int. */
  val intColumns: Seq[String] = Seq("Opens", "Opens virales", "Clicks", "Clicks virales")

  /** String columns (everything not date/int). */
  val strColumns: Seq[String] = validColumns.diff(dateColumns ++ intColumns)

  /** File column name → SQL column name (utils/utils_transform.py:26-42). */
  val columnsToMap: Map[String, String] = Map(
    "email" -> "email", "jyv" -> "jyv", "Badmail" -> "badMail", "Baja" -> "baja",
    "Fecha envio" -> "fechaEnvio", "Fecha open" -> "fechaOpen",
    "Opens" -> "opens", "Opens virales" -> "opensVirales",
    "Fecha click" -> "fechaClick", "Clicks" -> "clicks",
    "Clicks virales" -> "clicksVirales", "Links" -> "links",
    "IPs" -> "ips", "Navegadores" -> "navegadores", "Plataformas" -> "plataformas")

  /** RFC-lite email regex, anchored (utils/utils_transform.py:111). Uses only
    * constructs portable across Java/PCRE/pandas `str.match`.
    */
  val emailRegex: String =
    "^[a-zA-Z0-9][a-zA-Z0-9._%+-]*@[a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?(\\.[a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?)*\\.[a-zA-Z]{2,}$"

  /** `dd/MM/yyyy HH:mm` SHAPE regex, anchored (utils/utils_transform.py:120).
    * Deliberately shape-only: `29/02/2023 10:00` and `31/04/...` PASS — the
    * reference validates format, not calendar validity (SURVEY.md §5.3).
    */
  val dateRegex: String =
    "^(0[1-9]|[12][0-9]|3[01])/(0[1-9]|1[0-2])/\\d{4}\\s([01][0-9]|2[0-3]):[0-5][0-9]$"

  /** Timestamp parse pattern for the post-split cast (P13). */
  val datePattern: String = "dd/MM/yyyy HH:mm"

  /** Read-time schema: all 15 columns as nullable STRING (see scaladoc). */
  val rawSchema: StructType =
    StructType(validColumns.map(c => StructField(c, StringType, nullable = true)))

  /** Post-rename schema of the `estadisticas` output (database/schema.sql:19-39). */
  val estadisticasSchema: StructType = StructType(Seq(
    StructField("nombreArchivo", StringType),
    StructField("email", StringType),
    StructField("jyv", StringType),
    StructField("badMail", StringType),
    StructField("baja", StringType),
    StructField("fechaEnvio", TimestampType),
    StructField("fechaOpen", TimestampType),
    StructField("opens", IntegerType),
    StructField("opensVirales", IntegerType),
    StructField("fechaClick", TimestampType),
    StructField("clicks", IntegerType),
    StructField("clicksVirales", IntegerType),
    StructField("links", StringType),
    StructField("ips", StringType),
    StructField("navegadores", StringType),
    StructField("plataformas", StringType)))
}
