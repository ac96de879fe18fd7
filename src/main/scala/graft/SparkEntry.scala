package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family; each entry has a
  * DuckDB-equivalent oracle in `oracleSql` (or a rows-only check where the
  * operator is not SQL-expressible, e.g. the alignment kernels).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (graft.queries.Relational.queries, graft.queries.Relational.oracle),
    (graft.queries.TextDedup.queries, graft.queries.TextDedup.oracle),
    (graft.queries.Vector.queries, graft.queries.Vector.oracle),
    (graft.queries.AlignQueries.queries, graft.queries.AlignQueries.oracle),
    (graft.queries.AudioQueries.queries, graft.queries.AudioQueries.oracle),
    (graft.queries.TimeWindows.queries, graft.queries.TimeWindows.oracle),
    (graft.queries.MultimodalQueries.queries,
      graft.queries.MultimodalQueries.oracle),
    (graft.queries.Coverage.queries, graft.queries.Coverage.oracle),
    (graft.queries.Functions.queries, graft.queries.Functions.oracle),
    (graft.queries.Curation.queries, graft.queries.Curation.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped pricing summary (SURVEY.md §2.4 A1).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational
      .queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
