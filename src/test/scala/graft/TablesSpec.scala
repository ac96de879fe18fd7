package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary. The driver has regenerated /root/testdata under
  * the repo once already (round 8: events.ts flipped TIMESTAMP(NANOS) →
  * timestamp[us] and silently broke 26 queries). This spec pins the
  * LOGICAL schema each `Tables` accessor yields, so the next regeneration
  * fails ONE test with a readable table/column/type diff instead of
  * scattering analysis errors across the query surface.
  *
  * `events.ts` is asserted POST-normalization (TimestampType): the loader
  * sniffs the physical form and accepts both known generations; a third
  * form that defeats the sniff shows up here as a non-timestamp type.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  private val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)

  test("every Tables accessor covers exactly Tables.names") {
    assert(loaders.keySet == Tables.names.toSet)
    assert(expected.keySet == Tables.names.toSet)
  }

  for (name <- Tables.names) {
    test(s"$name: loaded logical schema matches the pinned fixture contract") {
      val got = loaders(name)(spark, sf).schema
        .map(f => f.name -> f.dataType)
      val want = expected(name)
      assert(got == want,
        s"\nFIXTURE SCHEMA DRIFT for table '$name' — the driver likely " +
        s"regenerated /root/testdata.\n  loaded: $got\n  pinned: $want\n" +
        "If the new shape is legitimate, update Tables loaders (normalize " +
        "in one place, as Tables.events does) and then this spec.")
    }
  }

  test("canary goes red on a deliberately retyped events fixture") {
    import org.apache.spark.sql.functions._
    val dir = TestDirs.tmp("retyped-events").toString
    Tables.events(spark, sf)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir).schema.map(f => f.name -> f.dataType)
    assert(got != expected("events"),
      "retyped ts (string) must NOT satisfy the pinned schema")
    assert(got.toMap.apply("ts") == StringType)
  }

  test("events: ts values survive normalization (spot row)") {
    import org.apache.spark.sql.functions._
    val row = Tables.events(spark, sf)
      .orderBy("event_id")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .head()
    // Deterministic fixture: event 0's wall-clock micros must be stable
    // across loader paths (nanos-rebuild vs NTZ cast under UTC session).
    // Pinned to the exact value DuckDB reads (epoch_us) from the parquet
    // — a wrong rebuild factor (ns→µs off by 10³) would still be > 0,
    // so the old positivity check could not catch it.
    assert(row.getLong(0) == 0L)
    assert(row.getLong(1) == 1704067798778549L,
      s"ts micros drifted: got ${row.getLong(1)}, the fixture's event 0 " +
        "reads 1704067798778549 in DuckDB — loader conversion is wrong " +
        "or the driver regenerated the fixture")
  }
}
