package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver-facing harness itself. */
class HarnessSpec extends AnyFunSuite {

  test("oracle SQL strings survive JSON escaping round-trip") {
    // replicate Verify.q exactly
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    SparkEntry.oracleSql.foreach { case (k, v) =>
      val parsed = mapper.readTree(s"{${q(k)}: ${q(v)}}")
      assert(parsed.get(k).asText() == v, s"escape mangled oracle for $k")
    }
  }

  test("all oracle SQL strings are non-empty and reference known tables") {
    val tables = Set("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      assert(tables.exists(t => sql.contains(t)),
        s"$k oracle references no known table")
    }
  }
}
