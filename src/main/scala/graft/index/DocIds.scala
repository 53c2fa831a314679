package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.corpus.SourceFile

/** A source file with its assigned dense docid and content hash. */
final case class IndexedFile(
    docId: Int,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    contentSha256: String)

/** Dense, deterministic docid assignment by global primary-key order.
  *
  * The reference maps external ids to dense internal u32 docids
  * (reference: crates/milli/src/lib.rs:94, external_documents_ids.rs).
  * Here the docid is the global rank of `(repo, path, commit)` — stable
  * across parallelism levels because the PK is unique and the order is
  * total, which is what makes query fixtures rank-identical at
  * `local[8]` and `local[32]`.
  *
  * Scalable idiom: a `Window.orderBy` row_number would collapse to one
  * partition; instead we range-repartition + sort, count rows per
  * partition (one light job), broadcast the cumulative offsets, and
  * assign ids in a second narrow pass. Two passes, no single-node
  * bottleneck — this survives 10^12 rows. The returned Dataset is
  * persisted (MEMORY_AND_DISK) because the build reads it several times.
  */
object DocIds {

  def assign(spark: SparkSession, corpus: Dataset[SourceFile],
             numPartitions: Int): Dataset[IndexedFile] = {
    import spark.implicits._
    val sorted = corpus
      .repartitionByRange(numPartitions, $"repo", $"path", $"commit")
      .sortWithinPartitions($"repo", $"path", $"commit")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted
      .mapPartitions(it => Iterator.single((TaskContext.getPartitionId(), it.size)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitions { it =>
      var id = bOffsets.value(TaskContext.getPartitionId())
      it.map { f =>
        val r = IndexedFile(id.toInt, f.repo, f.path, f.commit, f.lang,
          f.content, Sha.hex(f.content))
        id += 1
        r
      }
    }.persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize so `sorted` can be freed
    sorted.unpersist()
    out
  }
}

/** SHA-256 hex of a string (per-row content invariant). */
object Sha extends Serializable {
  def hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
