package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  test("native vector kernels are bit-identical to the HOF folds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      GraftFunctions.vec_dot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd"),
      GraftFunctions.vec_norm(col("a")).as("nn"),
      hofNorm(col("a")).as("hn"),
      GraftFunctions.vec_sqdist(col("a"), col("b")).as("ns"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, e) => s + e).as("hs"),
      GraftFunctions.cosine_sim(col("a"), col("b")).as("nc"),
      (hofDot(col("a"), col("b")) /
        (hofNorm(col("a")) * hofNorm(col("b")))).as("hc"))
      .collect()
    cmp.foreach { r =>
      // exact ==: same IEEE op order, so not even 1-ulp drift is allowed
      assert(r.getDouble(0) == r.getDouble(1), "dot")
      assert(r.getDouble(2) == r.getDouble(3), "norm")
      assert(r.getDouble(4) == r.getDouble(5), "sqdist")
      assert(r.getDouble(6) == r.getDouble(7), "cosine")
    }
  }

  test("null arrays propagate null; length mismatch throws") {
    import spark.implicits._
    val df = Seq((Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(GraftFunctions.vec_dot(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.vec_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("a NULL array ELEMENT propagates null (never read as 0.0)") {
    import spark.implicits._
    val df = Seq((1L, Seq(Some(1.0), None, Some(3.0)),
      Seq(Some(1.0), Some(2.0), Some(3.0)))).toDF("id", "a", "b")
    val out = df.select(
      GraftFunctions.vec_dot(col("a"), col("b")).as("d"),
      GraftFunctions.cosine_sim(col("a"), col("b")).as("c"),
      GraftFunctions.vec_sqdist(col("a"), col("b")).as("s"),
      GraftFunctions.vec_norm(col("a")).as("n")).collect()(0)
    (0 until 4).foreach(i => assert(out.isNullAt(i),
      s"field $i must be null for a null element"))
    // matches the HOF composition's null semantics
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)).collect()(0)
    assert(hof.isNullAt(0))
  }

  test("SQL registration: cosine_sim and simhash_code callable from " +
    "spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " vec_sqdist(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS d," +
        " simhash_code(array('a', 'b'), 4) AS s")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 25.0)
    // md5(a)=0cc1..., md5(b)=92eb...: digit signs (-1,+1,+1,-1) and
    // (+1,-1,+1,+1) → sums (0,0,2,0) → bits "0010"
    assert(r.getString(2) == "0010")
  }

  test("the kernels run inside whole-stage codegen (no fallback)") {
    // spark.range keeps the plan non-local so codegen actually runs
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(GraftFunctions.cosine_sim(col("a"), col("b")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes a WholeStageCodegen stage; a fallback Project
    // would print without the star
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(df.collect().forall(r => !r.isNullAt(0)))
  }
}
