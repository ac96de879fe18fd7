package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dumps `SparkEntry.oracleSql` as JSON without starting Spark — lets a
  * DuckDB-side script `DESCRIBE` every oracle and flag output columns
  * whose type the driver's hasher encodes differently from Spark
  * (HUGEINT from integer SUM widening, DECIMAL, etc.). Serialization is
  * [[OracleJson]], byte-identical to [[Verify]]'s oracle_sql.json.
  *
  * Usage: runMain graft.DumpOracles <outFile.json>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    Files.write(Paths.get(out),
      OracleJson.render.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
