package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One source file of the synthetic corpus (the north-rule input shape:
  * repo, path, commit, lang, content — see BASELINE.json input_hint). */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Deterministic synthetic source-code corpus generator.
  *
  * Generation is fully distributed (`spark.range(n)` + pure per-row
  * functions of the row index and seed): no driver-side loops, so the
  * same code generates 500 docs for smoke tests or 10^12 files on a
  * cluster. Content exercises the tokenizer (camelCase / snake_case
  * identifiers) and the skew path (stop-terms `return`, `import`, `def`,
  * `fn` appear in a large fraction of documents, like real code).
  */
object CorpusGen {
  final val Langs = Array("scala", "rust", "py", "js", "java", "go")
  private val Ext = Map("scala" -> "scala", "rust" -> "rs", "py" -> "py",
    "js" -> "js", "java" -> "java", "go" -> "go")

  private val NounsA = Array("parse", "build", "merge", "scan", "sort", "hash",
    "read", "write", "flush", "split", "encode", "decode", "pack", "load")
  private val NounsB = Array("Buffer", "Index", "Table", "Stream", "Block",
    "Segment", "Shard", "Cursor", "Batch", "Record", "Header", "Page")
  private val Snake = Array("row_count", "byte_len", "doc_id", "term_freq",
    "max_score", "block_size", "page_cache", "seek_pos", "chunk_iter")
  private val StopTerms = Array("return", "import", "def", "fn", "val", "let")

  /** splitmix64 — public-domain mixing function; the per-row PRNG. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def pick[T](arr: Array[T], r: Long): T =
    arr(((r % arr.length + arr.length) % arr.length).toInt)

  /** Zipf-ish repo id: a few repos hold most files. */
  def repoOf(i: Long, nRepos: Int, seed: Long): String = {
    val r = mix(seed ^ i) >>> 1
    // map uniform -> zipf-ish via squaring the unit sample
    val u = (r % 1000000) / 1000000.0
    val id = (u * u * nRepos).toInt
    f"org-${id % 97}%05d/proj-${id}%d"
  }

  /** Deterministic content for row i: identifier soup with comments. */
  def contentOf(i: Long, seed: Long): String = {
    val r0 = mix(seed ^ (i * 31 + 7))
    val nLines = 4 + ((r0 >>> 8) % 12).toInt
    val sb = new java.lang.StringBuilder(256)
    var ln = 0
    while (ln < nLines) {
      val r = mix(r0 + ln)
      val ident = pick(NounsA, r) + pick(NounsB, r >>> 13)
      val snake = pick(Snake, r >>> 23)
      val stop = pick(StopTerms, r >>> 33)
      (((r >>> 43) % 4).toInt: @unchecked) match {
        case 0 => sb.append(s"$stop ${ident}(${snake});\n")
        case 1 => sb.append(s"// ${pick(NounsA, r >>> 3)} the $snake quickly\n")
        case 2 => sb.append(s"$stop $snake = ${ident}.${pick(NounsA, r >>> 17)}Fast();\n")
        case 3 => sb.append(s"if ($snake > ${(r >>> 50) % 100}) { $stop $ident; }\n")
      }
      ln += 1
    }
    sb.toString
  }

  def commitOf(i: Long, seed: Long): String =
    f"${mix(seed ^ i ^ 0xc0ffee)}%016x${mix(seed ^ i ^ 0xdead)}%016x${(mix(i) & 0xffffffffL)}%08x"

  /** Generate `n` files. Columns: repo, path, commit, lang, content,
    * content_sha256. Distributed: one narrow map over spark.range. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val files: Dataset[SourceFile] = spark.range(n).map { i =>
      val lang = pick(Langs, mix(seed ^ (i + 1)))
      val dir = pick(NounsA, mix(seed ^ (i * 13)))
      val file = pick(NounsB, mix(seed ^ (i * 17))) + "Util"
      SourceFile(
        repo = repoOf(i, math.max(8, (n / 64).toInt), seed),
        path = s"src/$dir/$file${i % 1000}.${Ext(lang)}",
        commit = commitOf(i, seed),
        lang = lang,
        content = contentOf(i, seed))
    }
    files.toDF().withColumn("content_sha256", sha2(col("content"), 256))
  }
}
