package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.rank.TypoSettings
import graft.search.SearchEngine

/** Index-level statistics (reference GET /indexes/{uid}/stats:
  * numberOfDocuments, isIndexing, fieldDistribution). `isIndexing` maps
  * to "the lineage has uncommitted stages": every committed stage
  * leaves a `_COMMITTED` marker, so a directory with a `docs` dir but
  * no committed `stats` stage is mid-build (or crashed — either way,
  * not ready to serve). */
final case class IndexStats(numberOfDocuments: Long,
                            fieldDistribution: Map[String, Long])

/** Multi-index client (reference index CRUD + POST /swap-indexes,
  * meilisearch/src/routes/indexes/ + swap_indexes.rs): named indexes as
  * directories under one root. Swap is the reference's atomic-rename
  * trick — production deploys build `products_new` offline and swap it
  * with `products` so readers never see a half-built index. */
final class Client(spark: SparkSession, rootDir: String) {
  private val root = new Path(rootDir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dirOf(uid: String): Path = {
    require(uid.nonEmpty && uid.matches("[A-Za-z0-9_-]+"),
      s"invalid index uid '$uid' (A-Za-z0-9_- only, reference uid rules)")
    new Path(root, uid)
  }

  /** Directory for a (new or existing) index uid — hand it to
    * IndexBuild.build* to create/update the index. */
  def indexDir(uid: String): String = dirOf(uid).toString

  def indexExists(uid: String): Boolean = fs.exists(dirOf(uid))

  /** Open an index for searching. */
  def index(uid: String, synonyms: Map[String, Seq[String]] = Map.empty,
            typo: TypoSettings = TypoSettings()): Index = {
    require(indexExists(uid), s"index '$uid' does not exist")
    new Index(new SearchEngine(spark, indexDir(uid)), synonyms, typo)
  }

  /** All index uids under the root, sorted. */
  def listIndexes(): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq

  def stats(uid: String): IndexStats = {
    val e = new SearchEngine(spark, indexDir(uid))
    IndexStats(e.nDocs, e.fieldDistribution())
  }

  /** Atomically exchange two indexes (reference swap_indexes: both must
    * exist; readers opening by uid after the swap see the other data). */
  def swapIndexes(a: String, b: String): Unit = {
    val (pa, pb) = (dirOf(a), dirOf(b))
    require(fs.exists(pa) && fs.exists(pb),
      s"swap requires both indexes to exist: '$a', '$b'")
    val tmp = new Path(root, s".swap-$a-$b-${System.nanoTime()}")
    require(fs.rename(pa, tmp) && fs.rename(pb, pa) && fs.rename(tmp, pb),
      s"swap of '$a' and '$b' failed mid-way — a .swap-* dir remains for recovery")
  }

  /** Delete an index and everything in it. */
  def deleteIndex(uid: String): Unit = {
    val p = dirOf(uid)
    require(fs.exists(p), s"index '$uid' does not exist")
    fs.delete(p, true): Unit
  }
}
