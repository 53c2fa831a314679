package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rank.{MeiliRank, TermsMatching, TypoSettings}
import graft.search.SearchEngine

/** One search call, mirroring the reference's search API surface
  * (meilisearch/src/search/mod.rs SearchQuery: q, filter, sort, limit,
  * offset, attributesToSearchOn, matchingStrategy, distinct,
  * rankingScoreThreshold). `sort` entries are `field:asc|desc`,
  * evaluated lexicographically at the position of the `sort` ranking
  * rule. Query-string syntax (quoted phrases, `-negatives`) applies. */
final case class SearchRequest(
    q: String = "",
    filter: Option[String] = None,
    sort: Seq[String] = Nil,
    limit: Int = 20,
    offset: Int = 0,
    attributesToSearchOn: Option[Seq[String]] = None,
    matchingStrategy: String = "last",
    rankingScoreThreshold: Option[Double] = None,
    distinct: Option[String] = None,
    rankingRules: Seq[String] = MeiliRank.DefaultRules,
    lastWordIsPrefix: Boolean = false)

/** Index-level client facade: settings (synonyms live here, like the
  * reference's index settings; stop words and field weights are
  * index-time settings read from the index itself) + one `search`
  * entry point over the ranking cascade. Everything stays a DataFrame —
  * the caller composes further or collects. */
final class Index(val engine: SearchEngine,
                  synonyms: Map[String, Seq[String]] = Map.empty,
                  typo: TypoSettings = TypoSettings()) {
  private val mr = new MeiliRank(engine, synonyms, typo)
  import engine.spark.implicits._

  /** field name → fid for attributesToSearchOn (multi-field indexes). */
  private lazy val fieldIds: Map[String, Int] = {
    val p = new org.apache.hadoop.fs.Path(s"${engine.indexDir}/fields")
    val fs = p.getFileSystem(engine.spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      engine.spark.read.parquet(s"${engine.indexDir}/fields")
        .select($"name", $"fid").as[(String, Int)].collect().toMap
    else Map.empty
  }

  def search(r: SearchRequest): DataFrame = {
    val strategy = r.matchingStrategy.toLowerCase match {
      case "last" => TermsMatching.Last
      case "all" => TermsMatching.All
      case "frequency" => TermsMatching.Frequency
      case other => throw new IllegalArgumentException(
        s"unknown matchingStrategy '$other' (last|all|frequency)")
    }
    val fids = r.attributesToSearchOn.map { names =>
      names.map(n => fieldIds.getOrElse(n,
        throw new IllegalArgumentException(s"unknown searchable attribute '$n'"))).toSet
    }
    // sort entries replace the `sort` rule slot in configured order
    // (multi-entry sort = lexicographic at that position)
    val rules = r.rankingRules.flatMap {
      case "sort" => r.sort
      case other => Seq(other)
    }
    val ranked = mr.search(r.q, r.offset + r.limit,
      filterExpr = r.filter,
      distinct = r.distinct,
      lastIsPrefix = r.lastWordIsPrefix,
      strategy = strategy,
      scoreThreshold = r.rankingScoreThreshold,
      searchOnFids = fids,
      rankingRules = rules)
    if (r.offset == 0) ranked
    else {
      // offset+limit is page-sized (reference caps at maxTotalHits):
      // slice the already-ranked top-(offset+limit) driver-side, exactly
      // like the reference's paginator — never a global-sort skip
      val rows = ranked.collect().drop(r.offset).toSeq
      engine.spark.createDataFrame(
        engine.spark.sparkContext.parallelize(rows, 1), ranked.schema)
    }
  }

  /** Exhaustive hit count for the request's query + filter. */
  def totalHits(r: SearchRequest): Long =
    engine.totalHits(r.q, conjunctive = false, filter = r.filter)
}
