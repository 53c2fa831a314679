package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid keyword + semantic search (reference
  * crates/milli/src/search/hybrid.rs: `search_hybrid` runs the keyword
  * and vector searches, weighs each hit's normalized score by the
  * semantic ratio, and merges the two lists comparing weighted scores —
  * `compare_scores` at hybrid.rs:21, ratio merge at :88-160).
  *
  * Re-expression: both sides are DataFrames of (docId, score∈[0,1]) —
  * keyword = MeiliRank's exact mixed-radix rankingScore, semantic =
  * cosine similarity. A doc's hybrid score is the best of its weighted
  * scores, max((1−ratio)·kw, ratio·sem) — exactly the order the
  * reference's merge-by-weighted-score visits docs in, dedup keeping
  * the better origin. ratio=0 → pure keyword, ratio=1 → pure semantic.
  */
object Hybrid {

  /** Merge pre-scored lists. `keyword`: (docId, rankingScore);
    * `semantic`: (docId, score). Returns (docId, hybridScore, kwScore,
    * semScore) top-k by (hybridScore desc, docId asc). */
  def merge(keyword: DataFrame, semantic: DataFrame, ratio: Double,
            k: Int): DataFrame = {
    require(ratio >= 0.0 && ratio <= 1.0, "semanticRatio in [0,1]")
    val kw = keyword.select(col("docId"), col("rankingScore").as("kwScore"))
    val sem = semantic.select(col("docId"), col("score").as("semScore"))
    kw.join(sem, Seq("docId"), "full_outer")
      .withColumn("hybridScore", round(greatest(
        coalesce(col("kwScore") * (1.0 - ratio), lit(0.0)),
        coalesce(col("semScore") * ratio, lit(0.0))), 6))
      .select(col("docId"), col("hybridScore"),
        round(coalesce(col("kwScore"), lit(0.0)), 6).as("kwScore"),
        round(coalesce(col("semScore"), lit(0.0)), 6).as("semScore"))
      .orderBy(col("hybridScore").desc, col("docId").asc)
      .limit(k)
  }

  /** End-to-end: rank `q` with the rule cascade, score embeddings by
    * cosine against `queryVecId`'s embedding, merge at `ratio`.
    * `emb` rows must be keyed by the same ids as the doc store. */
  def search(mr: graft.rank.MeiliRank, emb: DataFrame, idCol: String,
             vecCol: String, q: String, queryVecId: Long, ratio: Double,
             k: Int, candidatePool: Int = 1000000): DataFrame = {
    val kw = mr.search(q, candidatePool)
      .select(col("docId"), col("rankingScore"))
    val sem = graft.ops.Similarity
      .cosineTopK(emb, idCol, vecCol, queryVecId, candidatePool)
      .select(col(idCol).cast("int").as("docId"), col("score"))
    merge(kw, sem, ratio, k)
  }
}
