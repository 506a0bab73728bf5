package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** P11-P15, A1, G1, A3 (SURVEY.md §2.2-2.4). */
class PrepareSpec extends SparkSpec {
  import spark.implicits._

  test("P11 null-normalization precedes casts: Opens='0' → null, not 0") {
    val raw = Seq(("a@x.com", "0", "-", "3")).toDF("email", "Opens", "jyv", "Clicks")
    val normalized = Prepare.normalizeNulls(raw, Seq("Opens", "jyv", "Clicks"))
    val row = normalized.head()
    assert(row.isNullAt(1) && row.isNullAt(2))   // "0" and "-" both null
    assert(row.getString(3) == "3")
    val cast = Prepare.enforceTypes(normalized, Seq("jyv"), Nil, Seq("Opens", "Clicks")).head()
    assert(cast.isNullAt(1))                     // null stays null through int cast
    assert(cast.getInt(3) == 3)
  }

  test("P13 timestamp coerce-cast: bad shapes null, dd/MM/yyyy HH:mm parses") {
    val df = Seq(("15/06/2024 13:45", "31/02/2024 10:00", "nonsense"))
      .toDF("a", "b", "c")
    val out = Prepare.enforceTypes(df, Nil, Seq("a", "b", "c"), Nil).head()
    assert(out.getTimestamp(0) == Timestamp.valueOf("2024-06-15 13:45:00"))
    assert(out.isNullAt(1))  // 31 Feb: regex-shape valid but calendar-invalid → null at cast
    assert(out.isNullAt(2))
  }

  test("P14 int coerce-cast: non-numeric → null (nullable, no crash)") {
    val out = Prepare.enforceTypes(Seq(("12", "x", " 7 ")).toDF("a", "b", "c"),
      Nil, Nil, Seq("a", "b", "c")).head()
    assert(out.getInt(0) == 12 && out.isNullAt(1) && out.getInt(2) == 7)
  }

  test("P2 rename covers all 15 columns") {
    val renamed = Prepare.renameColumns(
      Seq(Layout.validColumns.mkString(",")).toDF("x")
        .select(Layout.validColumns.map(c => lit("v").as(c)): _*))
    assert(renamed.columns.toSet == Layout.columnsToMap.values.toSet)
  }

  test("P15/estadisticas: reference column order") {
    val prepared = Prepare.prepare(
      Seq(1).toDF("i").select(Layout.validColumns.map(c => lit(null).cast("string").as(c)): _*))
    val est = Prepare.estadisticas(prepared, lit("f.txt"))
    assert(est.columns.toSeq == Layout.estadisticasSchema.fieldNames.toSeq)
  }

  test("A1 visitantes: three equal counters + real min/max dates") {
    val prepared = Seq(
      ("a@x.com", "2024-03-01 10:00:00"),
      ("a@x.com", "2024-03-05 09:00:00"),
      ("b@y.com", null)
    ).toDF("email", "s").withColumn("fechaEnvio", col("s").cast("timestamp")).drop("s")
    val v = Prepare.visitantes(prepared).orderBy("email").collect()
    assert(v(0).getString(0) == "a@x.com")
    assert(v(0).getInt(1) == 2 && v(0).getInt(2) == 2 && v(0).getInt(3) == 2)
    assert(v(0).getDate(4).toString == "2024-03-01" && v(0).getDate(5).toString == "2024-03-05")
    assert(v(1).getString(0) == "b@y.com" && v(1).isNullAt(4) && v(1).isNullAt(5))
  }

  test("G1 explode: cardinality = Σ failed checks, reference tag order") {
    val raw = Seq(
      ("bad", "99/99/2024 10:00", "01/01/2024 10:00", "xx"), // email + envio + click fail
      ("ok@x.com", "01/01/2024 10:00", null, "bad-shape")     // click fails
    ).toDF("email", "Fecha envio", "Fecha open", "Fecha click")
    val flagged = Validate.withValidityFlags(raw)
    val err = flagged.filter(!col("is_valid"))
    val exploded = Prepare.explodeErrors(err)
    val tags = exploded.select("email", "tipoError").as[(String, String)].collect().toSeq
    assert(tags.count(_._1 == "bad") == 3)
    assert(tags.filter(_._1 == "bad").map(_._2) == Seq("Email", "Fecha envio", "Fecha click"))
    assert(tags.filter(_._1 == "ok@x.com").map(_._2) == Seq("Fecha click"))
  }

  test("A3 single-pass bitacora equals the split+explode formulation") {
    val raw = Seq(
      ("f1", "bad", "99/99/2024 10:00", "01/01/2024 10:00"), // 2 failed checks
      ("f1", "ok@x.com", "01/01/2024 10:00", null),
      ("f2", "fine@y.io", null, null),
      ("f3", "no", "x", "y")                                 // 3 failed checks
    ).toDF("nombreArchivo", "email", "Fecha envio", "Fecha open")
    val fl = Validate.withValidityFlags(raw, dateCols = Seq("Fecha envio", "Fecha open"))
    val tags = Prepare.defaultErrorTags.filter(t => fl.columns.contains(t._1))
    val onePass = Prepare.bitacoraFromFlags(fl, errorTags = tags)
      .orderBy("nombreArchivo").collect()
    val twoPass = Prepare.bitacora(
      fl.filter(col("is_valid")),
      Prepare.explodeErrors(fl.filter(!col("is_valid")), tags))
      .orderBy("nombreArchivo").collect()
    assert(onePass.toSeq == twoPass.toSeq)
    assert(onePass.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("f1", 1L, 2L), ("f2", 1L, 0L), ("f3", 0L, 3L)))
  }

  test("A3 bitacora: per-file counts and un-inverted status") {
    val ok = Seq(("f1", 1), ("f1", 2), ("f2", 3)).toDF("nombreArchivo", "x")
    val err = Seq(("f1", 1)).toDF("nombreArchivo", "x")
    val bit = Prepare.bitacora(ok, err).orderBy("nombreArchivo").collect()
    assert(bit(0).getString(0) == "f1" && bit(0).getLong(1) == 2 && bit(0).getLong(2) == 1
      && bit(0).getString(3) == "Completado con errores")
    assert(bit(1).getString(0) == "f2" && bit(1).getLong(1) == 1 && bit(1).getLong(2) == 0
      && bit(1).getString(3) == "Completado")
  }
}
