package graft.queries

import graft.SparkSpec
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the interval-join family (q63/q64). The
  * oracle gate already pins both hash-exact vs DuckDB; these specs pin
  * the properties the oracle can't see — that the band-bucketed plan
  * EQUALS the naive all-pairs definition, and that the physical plans
  * are the scale shapes (hash join on the band bucket / one window, no
  * join), not a cartesian that merely happens to finish at test SF.
  */
class Extended5Spec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q63 band-bucketed range join equals the naive all-pairs filter") {
    import spark.implicits._
    val got = Extended5.q63RangeJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val ev = t(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"))
    val a = ev.select($"event_id".as("ia"), $"user_id".as("ua"), $"tus".as("ta"))
    val b = ev.select($"event_id".as("ib"), $"user_id".as("ub"), $"tus".as("tb"))
    // the definition, shape be damned: a cross product with the band
    // predicate (fine at sf0.001)
    val naive = a.crossJoin(b)
      .filter($"ia" < $"ib" && $"ua" =!= $"ub" &&
        abs($"ta" - $"tb") <= 10000000L)
      .select($"ia", $"ib", abs($"ta" - $"tb").as("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive, s"bucketed=${got.size} naive=${naive.size}")
    assert(got.nonEmpty)
  }

  test("q63 kernel property: bucketed == naive on adversarial boundary-straddling corpora") {
    import spark.implicits._
    val W = 1000L // small band so boundaries are dense
    val rnd = new scala.util.Random(4242)
    for (round <- 1 to 3) {
      // timestamps deliberately piled onto bucket edges: exact
      // multiples of W, ±1 around them, and the half-band midpoints —
      // the places where an off-by-one in the ±1 replication loses or
      // double-counts a pair
      val evs = (0 until 200).map { i =>
        val bucket = rnd.nextInt(20).toLong
        val offset = Seq(0L, 1L, W - 1, W, W / 2, W + 1)(rnd.nextInt(6))
        (i.toLong, rnd.nextInt(5).toLong, bucket * W + offset)
      }
      val df = evs.toDF("event_id", "user_id", "tus")
      val got = Extended5.rangeJoinBucketed(df, W).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      val want = (for {
        a <- evs; b <- evs
        if a._1 < b._1 && a._2 != b._2 && math.abs(a._3 - b._3) <= W
      } yield (a._1, b._1, math.abs(a._3 - b._3))).toSet
      assert(got == want,
        s"round $round: bucketed=${got.size} naive=${want.size}; " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"round $round generated no pairs — widen the generator")
    }
  }

  test("q63 plans an equi join on the band bucket, not a cartesian") {
    val p = plan(Extended5.q63RangeJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to an all-pairs physical plan:\n$p")
  }

  test("q64 forward as-of equals the naive per-view lookup") {
    import spark.implicits._
    val got = Extended5.q64ForwardAsof(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val ev = t(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    val views = ev.filter(_._3 == "view")
    assert(views.nonEmpty && purchases.nonEmpty)
    views.foreach { case (vid, uid, _, vt) =>
      val cand = purchases
        .filter(p => p._2 == uid && p._4 >= vt && p._4 <= vt + 3600000000L)
        .sortBy(p => (p._4, p._1))
      val want = cand.headOption.map(p => (p._1, p._4 - vt)).getOrElse((-1L, -1L))
      assert(got(vid) == want, s"view $vid: got ${got(vid)} want $want")
    }
  }

  test("q64 is one window pass — no join operator in the plan") {
    val p = plan(Extended5.q64ForwardAsof(spark, sfDir))
    assert(p.contains("Window"), s"expected a window:\n$p")
    assert(!p.contains("Join"), s"as-of must not plan a per-row join:\n$p")
  }

  test("q67 transition matrix equals an in-memory replay") {
    import spark.implicits._
    val got = Extended5.q67Transitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val ev = t(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._2)).toList.sliding(2).collect {
        case List(a, b) => (a._3, b._3)
      }
    }
    val cnt = trans.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val fromTot = cnt.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    assert(got.nonEmpty && got.length == cnt.size)
    got.foreach { case (f, t2, n, p) =>
      assert(cnt((f, t2)) == n, s"count mismatch for $f->$t2")
      assert(p == n.toDouble / fromTot(f), s"share mismatch for $f->$t2")
    }
    // shares are a probability distribution per from_type
    got.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("q68 top-10 paths end in TakeOrderedAndProject, not a global sort") {
    val df = Extended5.q68PathTopk(spark, sfDir)
    df.collect()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), s"expected a top-k heap:\n$p")
    // both leads ride one shared window — no join, no extra sort-exchange
    // chain (the AQE dump repeats plan sections, so count distinct
    // window NODES via the lead functions appearing together)
    assert(!p.contains("Join"), s"paths must not plan a join:\n$p")
    val initIdx = p.indexOf("Initial Plan")
    val finalSection = p.substring(p.indexOf("Final Plan"),
      if (initIdx >= 0) initIdx else p.length)
    assert("Window \\[".r.findAllIn(finalSection).size == 1,
      s"both leads must share ONE window node:\n$p")
  }

  test("q67 groups after ONE user-keyed window — no corpus-sized share window") {
    val p = plan(Extended5.q67Transitions(spark, sfDir))
    // the p-share window must consume the grouped |types|^2 table, so
    // the plan has an aggregate BELOW the final window
    assert(p.contains("Window"), s"expected windows:\n$p")
    assert("HashAggregate|SortAggregate".r.findFirstIn(p).nonEmpty, s"expected aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"))
  }
}
