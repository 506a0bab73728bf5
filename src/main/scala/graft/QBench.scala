package graft

/** Ad-hoc single-query timing harness: `runMain graft.QBench q1 q2 ...`
  * (all queries when no args). Timings print per query with row counts —
  * the inner-loop feedback tool while optimizing individual operators.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      printf("%s: %.2f s, %d rows%n", name, (System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()
  }
}
