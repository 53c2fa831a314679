package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism contract: dot products and norms are computed in
  * *fixed-point* — each elementwise product is rounded to 1e-9 units and
  * summed as BIGINT, so the result is independent of summation order
  * (integer addition is associative) and identical across Spark,
  * DuckDB, partitionings, and parallelism levels. The final cosine is a
  * single correctly-rounded double divide + sqrt of exact integers.
  */
object Similarity {

  /** v1·v2 in 1e-9 fixed point, as a codegen'd Column expression. */
  private def dotFx(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) ->
       |  cast(floor(cast(x as double) * cast(y as double) * 1e9 + 0.5d) as bigint)),
       |  0L, (acc, v) -> acc + v)""".stripMargin)

  private def normFx(a: String) = expr(
    s"""aggregate(transform($a, x ->
       |  cast(floor(cast(x as double) * cast(x as double) * 1e9 + 0.5d) as bigint)),
       |  0L, (acc, v) -> acc + v)""".stripMargin)

  /** Brute-force cosine top-k against the embedding of `queryId`.
    * One narrow pass over the table + TakeOrderedAndProject: the
    * correctness baseline. The query vector is a 1-row broadcast
    * (cross join of a broadcast single row — no shuffle). */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), normFx(vecCol).as("qn"))
    emb.crossJoin(broadcast(q))
      .withColumn("dot", dotFx(vecCol, "qvec"))
      .withColumn("nn", normFx(vecCol))
      .withColumn("score",
        round(col("dot") / sqrt((col("nn") * col("qn")).cast("double")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed approximate NN (the scale path): sign of the dot with
    * `nPlanes` seeded deterministic hyperplanes = the bucket key
    * (random-hyperplane LSH, Charikar '02); exact cosine re-ranking
    * within the query's bucket. At 10^12 rows the bucket join replaces
    * the full scan; recall is tested against [[cosineTopK]]. */
  def lshTopK(spark: SparkSession, emb: DataFrame, idCol: String,
              vecCol: String, queryId: Long, k: Int,
              nPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    // deterministic pseudo-random hyperplanes from splitmix64
    val planes: Array[Array[Double]] = Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val r = graft.corpus.CorpusGen.mix(seed ^ (p.toLong << 32) ^ d.toLong)
        (r.toDouble / Long.MaxValue) // in [-1, 1]
      }
    }
    val planesCol = array(planes.map(pl =>
      array(pl.map(v => lit(v)): _*)): _*)
    def bucketCol(vec: String) = expr(
      s"""aggregate(zip_with(planes_idx, planes_arr, (i, pl) ->
         |  if(aggregate(zip_with($vec, pl, (x, w) -> cast(x as double) * w),
         |     0d, (a, v) -> a + v) >= 0d, shiftleft(1L, i), 0L)),
         |  0L, (a, v) -> a + v)""".stripMargin)
    val withBucket = emb
      .withColumn("planes_arr", planesCol)
      .withColumn("planes_idx", expr(s"sequence(0, ${nPlanes - 1})"))
      .withColumn("bucket", bucketCol(vecCol))
      .drop("planes_arr", "planes_idx")
    val qb = withBucket.where(col(idCol) === queryId)
      .select(col("bucket").as("qbucket"), col(vecCol).as("qvec"),
        normFx(vecCol).as("qn"))
    withBucket.join(broadcast(qb), col("bucket") === col("qbucket"))
      .withColumn("dot", dotFx(vecCol, "qvec"))
      .withColumn("nn", normFx(vecCol))
      .withColumn("score",
        round(col("dot") / sqrt((col("nn") * col("qn")).cast("double")), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
