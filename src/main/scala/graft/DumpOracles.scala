package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dumps `SparkEntry.oracleSql` as JSON without starting Spark — lets a
  * DuckDB-side script `DESCRIBE` every oracle and flag output columns
  * whose type the driver's hasher encodes differently from Spark
  * (HUGEINT from integer SUM widening, DECIMAL, etc.).
  *
  * Usage: runMain graft.DumpOracles <outFile.json>
  */
object DumpOracles {
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
