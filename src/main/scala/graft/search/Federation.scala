package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Federated multi-index search (reference POST /multi-search,
  * routes/multi_search.rs + search/federated/: fan out per index, merge
  * result lists by weighted score, reference WeightedScoreValue
  * comparison score_details.rs:39-46). In Spark the merge is a union +
  * one TakeOrderedAndProject — no driver-side merge loop. */
object Federation {

  /** Run `q` on every (indexUid, engine, weight) and merge the top-k by
    * weighted score desc, then indexUid, then docId (deterministic). */
  def search(indexes: Seq[(String, SearchEngine, Double)], q: String,
             k: Int, conjunctive: Boolean = true): DataFrame = {
    require(indexes.nonEmpty)
    indexes.map { case (uid, engine, weight) =>
      engine.searchDF(q, k, conjunctive)
        .select(lit(uid).as("indexUid"), col("docId"),
          (col("score") * weight).as("weightedScore"))
    }.reduce(_ unionByName _)
      .orderBy(col("weightedScore").desc, col("indexUid").asc, col("docId").asc)
      .limit(k)
  }

  /** Normalized federation merge (the reference's actual comparison:
    * WeightedScoreValue over the detailed score normalized into [0,1],
    * score_details.rs:39-46): each index ranks with the rule cascade
    * and contributes rankingScore ∈ (0,1] × weight — cross-index
    * comparable even when corpus statistics differ. [[search]] (raw
    * BM25 × weight) remains for score-transparent merging where all
    * indexes share one corpus distribution; its scores are
    * corpus-dependent and NOT comparable across heterogeneous indexes. */
  def searchNormalized(indexes: Seq[(String, SearchEngine, Double)], q: String,
                       k: Int): DataFrame = {
    require(indexes.nonEmpty)
    indexes.map { case (uid, engine, weight) =>
      new graft.rank.MeiliRank(engine).search(q, k)
        .select(lit(uid).as("indexUid"), col("docId"),
          round(col("rankingScore") * weight, 9).as("weightedScore"))
    }.reduce(_ unionByName _)
      .orderBy(col("weightedScore").desc, col("indexUid").asc, col("docId").asc)
      .limit(k)
  }
}
