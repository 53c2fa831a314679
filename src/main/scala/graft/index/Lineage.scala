package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Checkpoint/lineage bookkeeping for resumable index builds (north
  * rule: "checkpoint each stage ... with per-partition lineage rows so a
  * killed job resumes from the last committed segment").
  *
  * Model (mirrors the reference's task/batch commit semantics,
  * crates/index-scheduler — a batch is visible iff its txn committed):
  *  - every build stage (or posting bucket wave) writes its data dir,
  *    then its lineage rows under `lineage/<stage>/`, then an empty
  *    `_COMMITTED` marker. A stage is visible/resumable iff the marker
  *    exists; a killed job re-runs only uncommitted stages.
  *  - lineage rows carry (partitionId, docidMin, docidMax, postingCount,
  *    bytes, sha256) computed from the *written* files, so they describe
  *    exactly what was committed.
  *
  * Uses the Hadoop FileSystem API so the same code runs on local FS in
  * tests and on HDFS/S3A on a cluster.
  */
object Lineage {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def markerPath(indexDir: String, stage: String): Path =
    new Path(s"$indexDir/lineage/$stage/_COMMITTED")

  def isCommitted(spark: SparkSession, indexDir: String, stage: String): Boolean =
    fs(spark, indexDir).exists(markerPath(indexDir, stage))

  /** Write lineage rows for a stage, then the commit marker. */
  def commit(spark: SparkSession, indexDir: String, stage: String,
             rows: Seq[LineageRow]): Unit = {
    import spark.implicits._
    val dir = s"$indexDir/lineage/$stage"
    spark.createDataset(rows).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/rows")
    val f = fs(spark, indexDir)
    val out = f.create(markerPath(indexDir, stage), true)
    out.close()
  }

  /** All committed lineage rows of an index (for inspection/tests). */
  def read(spark: SparkSession, indexDir: String): org.apache.spark.sql.DataFrame = {
    val f = fs(spark, indexDir)
    val base = new Path(s"$indexDir/lineage")
    if (!f.exists(base)) return spark.emptyDataFrame
    val stages = f.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, "_COMMITTED")))
      .map(p => new Path(p, "rows").toString)
    if (stages.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(stages.toIndexedSeq: _*)
  }

  /** Run `body` only if the stage is not yet committed; `body` must
    * return the lineage rows describing what it wrote. */
  def stage(spark: SparkSession, indexDir: String, stage: String)
           (body: => Seq[LineageRow]): Boolean = {
    if (isCommitted(spark, indexDir, stage)) false
    else {
      val t0 = System.nanoTime()
      val rows = body
      val tBody = (System.nanoTime() - t0) / 1e9
      commit(spark, indexDir, stage, rows)
      val tAll = (System.nanoTime() - t0) / 1e9
      if (sys.props.get("graft.build.verbose").contains("true"))
        System.err.println(f"[build] stage $stage%-22s ${tBody}%6.2fs (+commit ${tAll - tBody}%5.2fs)")
      true
    }
  }
}
