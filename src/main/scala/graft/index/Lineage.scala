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

  /** Write lineage rows for a stage, then the commit marker. Rows are
    * tiny and already on the driver: written as JSON lines through the
    * FileSystem API directly — a Spark job for a 5-row table would add
    * ~0.5s of serial driver time per stage, which is what erodes
    * scaling efficiency on short builds. */
  def commit(spark: SparkSession, indexDir: String, stage: String,
             rows: Seq[LineageRow]): Unit = {
    val f = fs(spark, indexDir)
    val dir = new Path(s"$indexDir/lineage/$stage/rows")
    f.mkdirs(dir)
    val out = f.create(new Path(dir, "rows.json"), true)
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    rows.foreach { r =>
      out.write((s"""{"stage":${js(r.stage)},"partitionId":${r.partitionId},""" +
        s""""docidMin":${r.docidMin},"docidMax":${r.docidMax},""" +
        s""""postingCount":${r.postingCount},"bytes":${r.bytes},""" +
        s""""sha256":${js(r.sha256)},"committedAt":${js(r.committedAt)}}""" + "\n")
        .getBytes("UTF-8"))
    }
    out.close()
    f.create(markerPath(indexDir, stage), true).close()
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
    else {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("stage", StringType), StructField("partitionId", IntegerType),
        StructField("docidMin", IntegerType), StructField("docidMax", IntegerType),
        StructField("postingCount", LongType), StructField("bytes", LongType),
        StructField("sha256", StringType), StructField("committedAt", StringType)))
      spark.read.schema(schema).json(stages.toIndexedSeq: _*)
        .select("stage", "partitionId", "docidMin", "docidMax",
          "postingCount", "bytes", "sha256", "committedAt")
    }
  }

  /** Idempotent publish of a staged append: move every data file under
    * `stagingDir` into `targetDir`, renaming it `<tag>-<name>` (one
    * level of `col=value` partition subdirs is preserved). Any target
    * files already carrying the tag prefix are deleted first, so a
    * re-run after a mid-publish kill converges to exactly one copy —
    * this is what makes `mode("append")` safe under resume (a plain
    * Spark append writes fresh UUID-named files on every attempt and
    * duplicates rows). The staging dir is removed on success. */
  def publishAppend(spark: SparkSession, stagingDir: String,
                    targetDir: String, tag: String): Unit = {
    val f = fs(spark, targetDir)
    val src = new Path(stagingDir)
    val dst = new Path(targetDir)
    f.mkdirs(dst)
    def dataFiles(dir: Path): Seq[Path] =
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).filter(_.isFile).map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .toIndexedSeq
    def partDirs(dir: Path): Seq[Path] =
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .map(_.getPath).toIndexedSeq
    // pre-delete any previous (possibly partial) publish of this tag
    (dst +: partDirs(dst)).foreach { d =>
      dataFiles(d).filter(_.getName.startsWith(s"$tag-")).foreach(p => f.delete(p, false))
    }
    def moveInto(from: Path, to: Path): Unit = {
      f.mkdirs(to)
      dataFiles(from).foreach(p => f.rename(p, new Path(to, s"$tag-${p.getName}")))
    }
    moveInto(src, dst)
    partDirs(src).foreach(pd => moveInto(pd, new Path(dst, pd.getName)))
    f.delete(src, true): Unit
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
