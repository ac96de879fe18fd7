package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** SQL-function family coverage: ranking, frame navigation, string, and
  * math/date scalar functions — the long tail a user switching engines
  * expects to keep working. All oracle-checked.
  */
object Functions {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ranking family over a real partition.
    "q77_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderpriority", "rnk")
    }),

    // Frame navigation: first/last/nth within bounded frames.
    "q78_frame_nav" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          first(col("value")).over(wFull).as("first_val"),
          last(col("value")).over(wFull).as("last_val"),
          nth_value(col("value"), 2).over(wFull).as("second_val"),
          lead(col("value"), 1).over(w).as("next_val"))
        .orderBy("user_id", "event_id")
    }),

    // String scalar family on part names.
    "q79_string_family" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 2, 5).as("sub"),
          length(col("p_name")).as("len"),
          reverse(col("p_name")).as("rev"),
          concat_ws("-", col("p_brand"), col("p_type")).as("tagged"),
          rpad(col("p_brand"), 12, ".").as("padded"),
          instr(col("p_name"), "a").cast("long").as("first_a"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          repeat(lit("x"), col("p_size") % 4 + 1).as("sized"))
        .orderBy("p_partkey")
    }),

    // Semi-structured: JSON extraction from the props column (the
    // engine's schema-on-read surface — the reference's entire data
    // model was untyped JSON).
    "q81_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"),
          from_json(col("props"), lit("k INT"))("k").isNotNull
            .as("parsed_ok"))
        .groupBy((col("k_num") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("parsed_ok"), 1).otherwise(0)).cast("long")
            .as("n_parsed"))
        .orderBy("k_mod")
    }),

    // Math + date scalar family on events.
    "q80_math_date_family" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          round(abs(col("value") - 100), 2).as("centered"),
          ceil(col("value")).cast("long").as("ceiled"),
          floor(col("value") / 7).cast("long").as("bucketed"),
          round(sqrt(col("value")), 5).as("rooted"),
          (col("event_id") % 13).as("modded"),
          // value has 2 decimals ⇒ value² is exact at 4: decimal cast
          // sidesteps round()'s shortest-string vs binary divergence
          (col("value") * col("value")).cast("decimal(18,4)")
            .cast("double").as("squared"),
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("dom"), hour(col("ts")).as("h"),
          date_format(date_trunc("month", col("ts")), "yyyy-MM-dd")
            .as("month_start"))
        .orderBy("event_id")
    })
  )

  def oracle: Map[String, String] = Map(
    "q77_rank_family" ->
      """SELECT o_orderpriority, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ROUND(percent_rank() OVER w, 6) AS prnk,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    "q78_frame_nav" ->
      """SELECT user_id, event_id,
        |  first_value(value) OVER wf AS first_val,
        |  last_value(value) OVER wf AS last_val,
        |  nth_value(value, 2) OVER wf AS second_val,
        |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS next_val
        |FROM events
        |WINDOW wf AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q79_string_family" ->
      """SELECT p_partkey, upper(p_name) AS up,
        |  substring(p_name, 2, 5) AS sub,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  reverse(p_name) AS rev,
        |  concat_ws('-', p_brand, p_type) AS tagged,
        |  rpad(p_brand, 12, '.') AS padded,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  repeat('x', CAST(p_size % 4 + 1 AS INTEGER)) AS sized
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q81_json_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed
        |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin,

    "q80_math_date_family" ->
      """SELECT event_id,
        |  ROUND(ABS(value - 100), 2) AS centered,
        |  CAST(CEIL(value) AS BIGINT) AS ceiled,
        |  CAST(FLOOR(value / 7) AS BIGINT) AS bucketed,
        |  ROUND(SQRT(value), 5) AS rooted,
        |  event_id % 13 AS modded,
        |  CAST(CAST(value * value AS DECIMAL(18,4)) AS DOUBLE) AS squared,
        |  CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
        |  CAST(day(ts) AS INTEGER) AS dom, CAST(hour(ts) AS INTEGER) AS h,
        |  strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start
        |FROM events ORDER BY event_id""".stripMargin
  )
}
