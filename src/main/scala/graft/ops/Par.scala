package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for compute-heavy per-row operators.
  *
  * At production scale the parquet scan is already thousands of splits
  * and repartitioning the raw corpus would be a catastrophic shuffle —
  * so these operators normally inherit scan parallelism untouched. But
  * a small input (single file / single row group — the test corpora
  * here) plans as ONE task, serializing tokenize/shingle/hash work that
  * is embarrassingly parallel. `widen` repartitions ONLY in that case:
  * when the planned scan parallelism is far below the cluster's cores,
  * the input is by definition small enough that the shuffle is free.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val planned = df.rdd.getNumPartitions // physical planning only, no job
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (planned * 4 < cores) df.repartition(cores) else df
  }
}
