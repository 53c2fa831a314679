package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** json_to_string flatten (reference crates/milli/src/lib.rs:255-300):
  * arrays join rendered values with ". ", objects emit "key: value. "
  * pairs, null renders nothing, and a composite with no leaf text
  * renders nothing at all. */
class JsonTextSpec extends AnyFunSuite {

  test("scalars render as text") {
    assert(JsonText.jsonToText("\"hello\"").contains("hello"))
    assert(JsonText.jsonToText("42").contains("42"))
    assert(JsonText.jsonToText("true").contains("true"))
  }

  test("null and invalid JSON render nothing") {
    assert(JsonText.jsonToText("null").isEmpty)
    assert(JsonText.jsonToText(null).isEmpty)
    assert(JsonText.jsonToText("{not json").isEmpty)
  }

  test("arrays join values with '. '") {
    assert(JsonText.jsonToText("""["a", "b", 3]""").contains("a. b. 3. "))
  }

  test("objects emit 'key: value. ' pairs in field order") {
    assert(JsonText.jsonToText("""{"lang": "en", "n": 5}""")
      .contains("lang: en. n: 5. "))
  }

  test("nested object renders recursively; null values drop their key") {
    assert(JsonText.jsonToText("""{"a": {"b": "x"}, "c": null}""")
      .contains("a: b: x. . "))
    // a composite that produced no leaf text renders nothing
    assert(JsonText.jsonToText("""{"a": {}}""").isEmpty)
    assert(JsonText.jsonToText("""[]""").isEmpty)
    assert(JsonText.jsonToText("""[null, {}]""").isEmpty)
  }

  test("column form flattens then feeds the tokenizer") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val flat = Seq("""{"title": "batchMerge", "tags": ["spark", "sql"]}""")
      .toDF("js")
      .select(JsonText.jsonToTextCol($"js").as("flat"))
      .as[String].head()
    assert(flat == "title: batchMerge. tags: spark. sql. . ")
    // camelCase value splits into subtokens downstream
    assert(Tokenizer.terms(flat).toSet ==
      Set("title", "batch", "merge", "tags", "spark", "sql"))
  }
}
