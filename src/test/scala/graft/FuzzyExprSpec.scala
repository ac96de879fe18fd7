package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Fuzzy, GraftFunctions}
import graft.audio.RmsAggregator

class FuzzyExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pairs = Seq(
    ("abcd", "abce"), ("kitten", "sitting"), ("", ""),
    ("hello world", "world hello"), ("שלום עולם", "עולם שלום"),
    ("abc", "zzabczz"))

  test("native expressions equal the JVM kernels (eval + codegen)") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val got = df.select(
      GraftFunctions.indel_ratio(col("a"), col("b")).as("r"),
      GraftFunctions.partial_ratio(col("a"), col("b")).as("p"),
      GraftFunctions.token_set_ratio(col("a"), col("b")).as("ts"),
      GraftFunctions.token_sort_ratio(col("a"), col("b")).as("tr"))
      .collect()
    got.zip(pairs).foreach { case (row, (a, b)) =>
      assert(row.getDouble(0) == Fuzzy.ratio(a, b))
      assert(row.getDouble(1) == Fuzzy.partialRatio(a, b))
      assert(row.getDouble(2) == Fuzzy.tokenSetRatio(a, b))
      assert(row.getDouble(3) == Fuzzy.tokenSortRatio(a, b))
    }
  }

  test("expressions run inside whole-stage codegen, not as UDFs") {
    // file-backed scan (literal inputs would constant-fold away)
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .select(GraftFunctions.indel_ratio(col("p_name"), col("p_type"))
        .as("r"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in plan toString
    assert(plan.contains("*(1) Project [indel_ratio"))
    assert(!plan.contains("ScalaUDF"))
    assert(df.count() > 0) // force execution through the generated code

    // the minhash-sigs kernel stays codegen'd too (its nullSafeCodeGen
    // body is hand-written — a regression to CodegenFallback would
    // silently re-interpret the banding hot path); split() is a
    // codegen'd tokenizer, so the whole projection must be a
    // WholeStageCodegen stage
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val mh = Tables.part(spark, "/root/testdata/sf0.001")
      .select(column(graft.functions.MinhashSigs(
        expression(split(col("p_name"), " ")),
        graft.ops.Dedup.xorConstants(16))).as("s"))
    val mhPlan = mh.queryExecution.executedPlan.toString
    assert(mhPlan.contains("*(1) Project"),
      "minhash_sigs fell out of whole-stage codegen:\n" + mhPlan.take(600))
    assert(mh.count() > 0)
  }

  test("SQL registration: indel_ratio callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT indel_ratio('abcd', 'abce') AS r, " +
        "token_set_ratio('a b c', 'b c d') AS ts").collect().head
    assert(r.getDouble(0) == 75.0)
    assert(r.getDouble(1) == 80.0)
  }

  test("SQL registration: wrong arity reports the expected signature, " +
    "not an index error") {
    GraftFunctions.register(spark)
    for ((sql, frag) <- Seq(
      ("SELECT indel_ratio('a') AS r", "indel_ratio(a, b)"),
      ("SELECT winnow_fingerprints('a', 8) AS r",
        "winnow_fingerprints(text, k, w)"),
      ("SELECT simhash_code(array('a')) AS r",
        "simhash_code(tokens, nBits)"))) {
      val e = intercept[Exception](spark.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected signature '$frag' in: ${msgs(e)}")
    }
  }

  test("GraftExtensions: the withExtensions injection path (the " +
    "spark.sql.extensions deployment recipe) registers every native " +
    "function in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // materialize the shared session first
    // relies on suites running sequentially (Test/fork with sbt's
    // default testForkedParallel=false): the default/active session is
    // JVM-global state, swapped here and restored in the finally. Do
    // NOT stop s2 — sessions share the one SparkContext.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, NEW session state built through the
      // extensions injector — the path a cluster reaches via
      // spark.sql.extensions=graft.functions.GraftExtensions
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig, "builder returned the existing session — " +
        "extensions were never applied")
      val r = s2.sql(
        "SELECT indel_ratio('abcd', 'abce') AS r, " +
          "simhash_code(array('a', 'b'), 8) AS c, " +
          "vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d").collect().head
      assert(r.getDouble(0) == 75.0)
      assert(r.getString(1).length == 8)
      assert(r.getDouble(2) == 11.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("null propagation") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT indel_ratio(NULL, 'x') AS r").collect().head
    assert(r.isNullAt(0))
  }

  test("RmsAggregator matches sqrt(avg(x^2)) and merges across partitions") {
    import spark.implicits._
    val xs = (1 to 1000).map(_.toDouble / 7.0)
    val df = xs.toDF("x").repartition(8)
    val viaAgg = df.agg(RmsAggregator.rms(col("x"))).collect().head.getDouble(0)
    val viaSql = df.agg(sqrt(avg(col("x") * col("x")))).collect()
      .head.getDouble(0)
    assert(math.abs(viaAgg - viaSql) < 1e-9)
    // empty input → 0.0
    val empty = Seq.empty[Double].toDF("x")
      .agg(RmsAggregator.rms(col("x"))).collect().head.getDouble(0)
    assert(empty == 0.0)
  }
}
