package graft
import java.nio.file.{Files, Paths}
/** Dev tool: dump SparkEntry.oracleSql as JSON without running Spark —
  * lets tools/oracle_dtype_audit.py DESCRIBE every oracle in DuckDB and
  * flag HUGEINT/INT32 columns that would hash-mismatch Spark's BIGINT. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
