package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, SkewJoin}

class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of join carries the whole payload row — no torn matches " +
    "from null payload columns") {
    import spark.implicits._
    // right rows: (ts=5, a=1, b=x) then (ts=15, a=null, b=y).
    // The latest prior row at t=20 is ts=15: a must be NULL (whole-row
    // semantics), not 1 stitched from the older ts=5 row.
    val left = Seq(("u1", 10.0), ("u1", 20.0)).toDF("k", "t")
    val right = Seq(
      ("u1", 5.0, Some(1), "x"),
      ("u1", 15.0, None: Option[Int], "y"))
      .toDF("k", "rt", "a", "b")
    val out = AsOfJoin.nearestPrior(left, right, Seq("k"), "t", "rt",
      Seq("a", "b"))
      .orderBy("t")
      .select("t", "a", "b")
      .collect()
    assert(out(0).getDouble(0) == 10.0)
    assert(out(0).getInt(1) == 1 && out(0).getString(2) == "x")
    assert(out(1).getDouble(0) == 20.0)
    assert(out(1).isNullAt(1), "torn match: old non-null 'a' resurrected")
    assert(out(1).getString(2) == "y")
  }

  test("as-of join: left rows with no prior right row get null payload") {
    import spark.implicits._
    val left = Seq(("u1", 1.0)).toDF("k", "t")
    val right = Seq(("u1", 5.0, 42)).toDF("k", "rt", "a")
    val out = AsOfJoin.nearestPrior(left, right, Seq("k"), "t", "rt",
      Seq("a")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("a")))
  }

  test("as-of join accepts non-orderable (map) payload columns; " +
    "orderable columns still break ties") {
    import spark.implicits._
    val left = Seq(("u1", 10.0)).toDF("k", "t")
    // map column would fail analysis if the tie-break ordered the whole
    // payload struct; it must be carried but excluded from the ordering
    val right = Seq(
      ("u1", 5.0, 1, Map("m" -> 1)),
      ("u1", 5.0, 2, Map("m" -> 2)))
      .toDF("k", "rt", "a", "attrs")
    val out = AsOfJoin.nearestPrior(left, right, Seq("k"), "t", "rt",
      Seq("a", "attrs")).select("a", "attrs").collect()
    assert(out.length == 1)
    // equal-ts tie resolved by the orderable column: largest `a` wins
    assert(out(0).getInt(0) == 2)
    assert(out(0).getMap[String, Int](1) == Map("m" -> 2))
  }

  test("salted join equals unsalted for every safe join type") {
    import spark.implicits._
    val big = (1 to 200).map(i => (i % 7, i)).toDF("key", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (99, "zz"))
      .toDF("key", "name")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("key"), jt)
      val salted = SkewJoin.saltedJoin(big, small, Seq("key"), "v",
        k = 4, joinType = jt)
      assert(salted.count() == plain.count(), s"joinType=$jt")
      assert(salted.exceptAll(plain).isEmpty &&
        plain.exceptAll(salted).isEmpty, s"joinType=$jt")
    }
  }

  test("property: as-of join equals a naive per-row scan on random " +
    "data with nulls and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map { i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toDouble, i)
    }.toDF("k", "t", "lid")
    val rightRows = (1 to 200).map { j =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toDouble,
        if (rnd.nextBoolean()) Some(j) else None, s"p$j")
    }
    val right = rightRows.toDF("k", "rt", "a", "b")

    val got = AsOfJoin.nearestPrior(left, right, Seq("k"), "t", "rt",
      Seq("a", "b"))
      .select("k", "t", "lid", "a", "b").collect()
      .map(r => (r.getInt(2), Option(r.get(3)), Option(r.get(4)))).toSet

    // naive: latest right row with rt <= t; equal-rt ties broken by the
    // payload struct's total order (nulls-first per field, field order)
    // — the deterministic pick the window's (_ts, _side, _payload)
    // ordering guarantees regardless of shuffle arrival order
    implicit val payloadOrd: Ordering[(Option[Int], String)] =
      Ordering.Tuple2(Ordering.Option(Ordering.Int), Ordering.String)
    val naive = left.collect().map { lr =>
      val (k, t, lid) = (lr.getString(0), lr.getDouble(1), lr.getInt(2))
      val prior = rightRows.filter(r => r._1 == k && r._2 <= t)
      if (prior.isEmpty) (lid, None: Option[Any], None: Option[Any])
      else {
        val bestT = prior.map(_._2).max
        val best = prior.filter(_._2 == bestT)
          .maxBy(r => (r._3, r._4))(Ordering.by(identity[(Option[Int],
            String)]))
        (lid, best._3.map(x => x: Any), Some(best._4): Option[Any])
      }
    }.toSet
    assert(got == naive)
    // the fixture must actually exercise equal-ts ties
    val tied = rightRows.groupBy(r => (r._1, r._2)).exists(_._2.size > 1)
    assert(tied, "fixture has no equal-(key,ts) right rows — ties untested")
  }

  test("property: saltedJoinHot equals the plain join across random " +
    "skew patterns and join types") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val hotShare = rnd.nextInt(800)
      val big = ((1 to hotShare).map(i => (999, i)) ++
        (1 to 400).map(i => (rnd.nextInt(40), i)))
        .toDF("key", "v")
      val small = (0 to 45).map(i => (i, s"n$i")).toDF("key", "name") // 999 unmatched
      for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
        val plain = big.join(small, Seq("key"), jt)
        val salted = SkewJoin.saltedJoinHot(big, small, Seq("key"), "v",
          k = 4, joinType = jt, sampleFraction = 0.5, hotThreshold = 200L)
        assert(salted.count() == plain.count(), s"trial=$trial jt=$jt")
        assert(salted.exceptAll(plain).isEmpty &&
          plain.exceptAll(salted).isEmpty, s"trial=$trial jt=$jt")
      }
    }
  }

  test("saltedJoinHot fanout follows the detected skew: one bucket per " +
    "hotThreshold slice, >= 2, capped at k") {
    // a key barely over the threshold spreads minimally; fanout grows
    // with the estimated count and saturates at the caller's cap
    assert(SkewJoin.fanoutFor(1000001.0, 1000000L, 8) === 2)
    assert(SkewJoin.fanoutFor(2000000.0, 1000000L, 8) === 2)
    assert(SkewJoin.fanoutFor(3500000.0, 1000000L, 8) === 4)
    assert(SkewJoin.fanoutFor(7.2e6, 1000000L, 8) === 8)
    assert(SkewJoin.fanoutFor(1e12, 1000000L, 8) === 8) // cap, no overflow
    assert(SkewJoin.fanoutFor(100.0, 1000000L, 8) === 2) // floor
  }

  test("salted join rejects outer join types (k-way duplicate hazard)") {
    import spark.implicits._
    val big = Seq((1, 1)).toDF("key", "v")
    val small = Seq((1, "a")).toDF("key", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer",
      "cross")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(big, small, Seq("key"), "v", joinType = jt)
      }
      assert(e.getMessage.contains("saltedJoin"), s"joinType=$jt")
    }
  }
}
