package graft.index

import org.apache.spark.sql.SparkSession

/** Query-side dictionary access with a bounded driver footprint.
  *
  * The reference keeps an FST over all words in LMDB and streams the
  * relevant key ranges per query (crates/milli/src/index.rs:62 words
  * FST; compute_derivations.rs walks it). The Spark analogue must NOT
  * collect the dictionary to the driver: at web scale the vocabulary is
  * 10^8-10^9 terms. This class:
  *
  *  - small dictionaries (≤ `collectThreshold` terms): one collect, all
  *    lookups served from an in-memory map/array — interactive-query
  *    fast, and exactly what a 60k-doc index wants;
  *  - large dictionaries: per-query *bucketed* loads with predicate
  *    pushdown on the dict parquet — exact-term lookups push an `IN`
  *    filter, typo expansion loads only the query word's length band
  *    (|len(t)−len(w)| ≤ budget is a necessary edit-distance condition),
  *    prefix expansion pushes a startsWith range. Loaded bands are
  *    cached, so a query workload touches a sliver of the vocabulary.
  */
final class TermDict(spark: SparkSession, dictPath: String,
                     collectThreshold: Long = TermDict.DefaultCollectThreshold)
    extends Serializable {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def dictDf = spark.read.parquet(dictPath)

  lazy val size: Long = dictDf.count()

  /** Small-mode full map (None above the threshold — callers must use
    * the bucketed APIs). */
  lazy val fullMap: Option[Map[String, Long]] =
    if (size <= collectThreshold)
      Some(dictDf.select($"term", $"df").as[(String, Long)].collect().toMap)
    else None

  private val bandCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), (Array[String], Array[Long])]
  private val prefixCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[(String, Long)]]

  /** Batch df lookup (one pushed-down scan in large mode). */
  def lookup(terms: Seq[String]): Map[String, Long] = fullMap match {
    case Some(m) => terms.iterator.flatMap(t => m.get(t).map(t -> _)).toMap
    case None =>
      if (terms.isEmpty) Map.empty
      else dictDf.filter($"term".isin(terms.distinct: _*))
        .select($"term", $"df").as[(String, Long)].collect().toMap
  }

  def contains(term: String): Boolean = lookup(Seq(term)).contains(term)

  /** All terms with length in [lo, hi], sorted ascending, with their
    * dfs (parallel arrays). Cached per band. */
  def lengthBand(lo: Int, hi: Int): (Array[String], Array[Long]) =
    bandCache.getOrElseUpdate((lo, hi), {
      val rows = fullMap match {
        case Some(m) => m.iterator
          .filter { case (t, _) => t.length >= lo && t.length <= hi }.toArray
        case None => dictDf.filter($"len".between(lo, hi))
          .select($"term", $"df").as[(String, Long)].collect()
      }
      val sorted = rows.sortBy(_._1)
      (sorted.map(_._1), sorted.map(_._2))
    })

  /** All (term, df) with the given prefix, sorted ascending. */
  def withPrefix(p: String): Array[(String, Long)] =
    prefixCache.getOrElseUpdate(p, {
      (fullMap match {
        case Some(m) => m.iterator.filter(_._1.startsWith(p)).toArray
        case None => dictDf.filter($"term".startsWith(p))
          .select($"term", $"df").as[(String, Long)].collect()
      }).sortBy(_._1)
    })
}

object TermDict {
  /** Above this many terms the dictionary is no longer collected whole;
    * ~2M terms ≈ tens of MB — comfortably a driver map, while real
    * web-scale vocabularies (10^8+) route to the bucketed path. */
  final val DefaultCollectThreshold: Long = 2L << 20
}
