package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.SparkTestBase
import graft.index.{Dump, IndexBuild, IndexConfig}
import graft.search.SearchEngine

/** Tokenizer settings surface (reference separatorTokens /
  * nonSeparatorTokens / dictionary index settings,
  * tokenize_document.rs:163-180): index-time segmentation overrides,
  * persisted with the index so the query side agrees by construction,
  * and carried through dumps. */
class TokSettingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val settings = Tokenizer.TokSettings(
    separatorTokens = Set('x'),
    nonSeparatorTokens = Set('-'),
    dictionary = Set("ActionScript"))

  test("pure-function semantics: promote, demote, dictionary words") {
    // '-' promoted to a word char: one token, hyphen preserved
    assert(Tokenizer.terms("foo-bar baz", settings) == Seq("foo-bar", "baz"))
    assert(Tokenizer.terms("foo-bar baz") == Seq("foo", "bar", "baz"))
    // 'x' demoted to a separator: the run splits
    assert(Tokenizer.terms("fooxbar", settings) == Seq("foo", "bar"))
    assert(Tokenizer.terms("fooxbar") == Seq("fooxbar"))
    // dictionary word exempt from subtoken splitting (case-insensitive)
    assert(Tokenizer.terms("ActionScript rules", settings) ==
      Seq("actionscript", "rules"))
    assert(Tokenizer.terms("actionscript rules", settings) ==
      Seq("actionscript", "rules"))
    assert(Tokenizer.terms("ActionScript rules") == Seq("action", "script", "rules"))
    // countTokens agrees with the settings-aware tokenize
    Seq("foo-bar baz", "fooxbar", "ActionScript rules", "a_b-c xd").foreach { t =>
      assert(Tokenizer.countTokens(t, settings) == Tokenizer.tokenize(t, settings).length, t)
    }
  }

  test("end-to-end: index-time settings drive both sides; dump carries them") {
    val dir = Files.createTempDirectory("toksettings").toString
    val docs = Seq(
      (0L, "foo-bar baz"), (1L, "foo bar"), (2L, "fooxbar here"),
      (3L, "ActionScript rules"), (4L, "action script split"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val cfg = IndexConfig(docsPerShard = 4, termBuckets = 2, blockSize = 4,
      numPartitions = 2, positions = true, tokenizer = settings)
    IndexBuild.buildFromTable(spark, docs, "doc_id", "text", "lang", "source",
      dir, cfg)
    val e = new SearchEngine(spark, dir)
    assert(e.tokSettings == settings, "settings persisted and loaded")
    // index side: 'foo-bar' is ONE term; 'fooxbar' split to foo|bar
    assert(e.dict.contains("foo-bar") && !e.dict.contains("fooxbar"))
    // query side segments the same way: "foo-bar" matches only doc 0
    val hyph = e.searchDF("foo-bar", 10).collect().map(_.getInt(0)).toSet
    assert(hyph == Set(0), s"$hyph")
    // 'fooxbar' as a query splits into foo+bar: docs 1 (foo bar) and 2
    val fx = e.searchDF("fooxbar", 10, conjunctive = true)
      .collect().map(_.getInt(0)).toSet
    assert(fx == Set(1, 2), s"$fx")
    // dictionary word stays whole on both sides
    val as = e.searchDF("ActionScript", 10).collect().map(_.getInt(0)).toSet
    assert(as == Set(3), s"$as")
    // dump roundtrip: settings survive, rebuilt index answers identically
    val dumpDir = Files.createTempDirectory("tokdump").toString
    val dir2 = Files.createTempDirectory("tokdump2").toString
    Dump.exportDump(spark, dir, dumpDir)
    Dump.importDump(spark, dumpDir, dir2, IndexConfig(numPartitions = 2))
    val e2 = new SearchEngine(spark, dir2)
    assert(e2.tokSettings == settings)
    assert(e2.searchDF("foo-bar", 10).collect().map(_.getInt(0)).toSet == Set(0))
  }
}
