package graft.operators

import org.apache.spark.sql.DataFrame

/** Explicit release of superseded `localCheckpoint` snapshots. Iterative
  * operators (BPE training, PageRank, connected components) checkpoint
  * per round to keep lineage flat; without an explicit drop every
  * superseded snapshot stays pinned in the block manager until the
  * ContextCleaner happens to GC it — one corpus/vocab/node-sized RDD per
  * round (the leak BpeSpec's bound pins to zero).
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD(s) backing `df` (no-op on frames that
    * are not local checkpoints). Only call once nothing will read `df`
    * again — a consumer evaluated after the drop recomputes from a
    * missing block and fails.
    */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
    }
}
