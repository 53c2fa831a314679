package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** `json_to_string` flatten: render a nested JSON value into indexable
  * text (reference crates/milli/src/lib.rs:255-300 — arrays join values
  * with ". ", objects emit "key: value. " pairs, null renders nothing,
  * and a composite that produced no leaf text renders nothing).
  * Enables indexing schemaless/nested documents: flatten a JSON column
  * to text, then feed it through the standard build. */
object JsonText {

  def jsonToText(json: String): Option[String] = {
    if (json == null) return None
    val mapper = JsonTextMapper.mapper
    val node = try mapper.readTree(json) catch { case _: Exception => return None }
    val sb = new java.lang.StringBuilder
    if (render(node, sb)) Some(sb.toString) else None
  }

  private def render(node: com.fasterxml.jackson.databind.JsonNode,
                     out: java.lang.StringBuilder): Boolean = {
    import com.fasterxml.jackson.databind.JsonNode
    node match {
      case null => false
      case n if n.isNull => false
      case n if n.isBoolean || n.isNumber || n.isTextual =>
        out.append(n.asText()); true
      case n if n.isArray =>
        var count = 0
        n.forEach { (v: JsonNode) =>
          if (render(v, out)) { out.append(". "); count += 1 }
        }
        count != 0
      case n if n.isObject =>
        var count = 0
        n.fields().forEachRemaining { e =>
          val buf = new java.lang.StringBuilder
          buf.append(e.getKey).append(": ")
          if (render(e.getValue, buf)) {
            buf.append(". ")
            out.append(buf) // "key: value. " only when the value rendered
            count += 1
          }
        }
        count != 0
      case _ => false
    }
  }

  /** Column form (UDF — JSON parsing has no codegen'd equivalent with
    * these exact semantics; use on the narrow ingest path only). */
  def jsonToTextCol(c: Column): Column = {
    val u = udf((s: String) => jsonToText(s).orNull)
    u(c)
  }
}

private object JsonTextMapper {
  // one mapper per JVM (thread-safe for readTree)
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper
}
