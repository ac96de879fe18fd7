package graft

/** The one JSON serialization of `SparkEntry.oracleSql`, shared by
  * [[Verify]] (the driver's correctness dump) and [[DumpOracles]] (the
  * DuckDB type-audit tool) so the escape rules cannot drift between the
  * two consumers.
  */
private[graft] object OracleJson {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `SparkEntry.oracleSql` as a JSON object, keys sorted. */
  def render: String =
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
}
