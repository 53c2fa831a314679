package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality scoring,
  * language ID, token counting, document fingerprinting. All built-in
  * expressions (codegen'd, oracle-portable); ratios rounded to 1e-6 of
  * exact integer counts, so results are bit-deterministic. */
object TextMetrics {

  private def toks(textCol: String): Column = Dedup.tokensCol(col(textCol))

  val StopWords: Seq[String] = Seq("the", "a", "an", "and", "of", "to",
    "in", "is", "it", "on", "for", "with")

  /** Per-doc quality metrics: token/char counts, average token length,
    * stop-word ratio, distinct-token ratio (type/token), alpha ratio. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    val stopArr = array(StopWords.map(lit): _*)
    Par.widen(df).select(
      col(idCol).as("id"),
      length(col(textCol)).as("n_chars_m"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      round(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double")
        / greatest(size(t), lit(1)), 6).as("avg_token_len"),
      round(size(filter(t, x => array_contains(stopArr, x))).cast("double")
        / greatest(size(t), lit(1)), 6).as("stopword_ratio"),
      round(size(array_distinct(t)).cast("double")
        / greatest(size(t), lit(1)), 6).as("distinct_ratio"))
  }

  /** Signature-stop-word language heuristic. Deterministic tie-break:
    * fixed evaluation order en > es > fr > de > und. (An n-gram model
    * would go here; the *pipeline shape* — per-doc score per language,
    * argmax — is the operator.) */
  val LangSignatures: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "es" -> Seq("el", "la", "los", "de", "y", "que"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ist"))

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    val scores = LangSignatures.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      size(filter(t, x => array_contains(arr, x))).as(s"s_$lang")
    }
    val scored = Par.widen(df).select(col(idCol).as("id") +: scores: _*)
    val best = LangSignatures.map(_._1).foldRight(lit("und"): Column) {
      case (lang, elseCol) =>
        val isMax = LangSignatures.map(_._1).filter(_ != lang)
          .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
        when(col(s"s_$lang") > 0 && isMax, lit(lang)).otherwise(elseCol)
    }
    scored.select(col("id"), best.as("lang_pred"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set —
    * order-insensitive near-exact dedup key (word-bag fingerprint). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.widen(df).select(col(idCol).as("id"), array_distinct(toks(textCol)).as("d"))
      .select(col("id"),
        md5(concat_ws(" ", array_sort(col("d")))).as("fp"),
        size(col("d")).as("n_distinct"))

  /** GPT-2-style pre-tokenizer piece pattern (letters run / digits run /
    * other-symbols run, each with an optional leading space) — shared
    * verbatim with the DuckDB oracle (RE2 and java.util.regex agree on
    * this subset). */
  final val BpePiecePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token-count estimates for training-budget accounting: `n_bpe_est` =
    * count of BPE-style pre-tokenizer pieces over the lowercased text
    * (each piece splits into >=1 BPE tokens, so this is a stable lower-
    * bound proxy), `n_char_est` = the chars/4 rule of thumb. Pure
    * codegen'd expressions — one narrow scan, no UDFs. */
  def tokenEstimate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.widen(df).select(col(idCol).as("id"),
      size(expr(s"regexp_extract_all(lower($textCol), '$BpePiecePattern', 0)"))
        .cast("long").as("n_bpe_est"),
      ceil(length(col(textCol)) / 4.0).cast("long").as("n_char_est"))
}
