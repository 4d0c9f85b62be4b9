package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("cosine_sim usable from SQL text after registration") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.5d, 0.5d)) AS c").head()
    assert(math.abs(r.getDouble(0) - math.sqrt(2) / 2) < 1e-12)
  }

  test("null inputs propagate null; registration is idempotent") {
    GraftFunctions.register(spark) // second call must not throw
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").head()
    assert(r.isNullAt(0))
  }

  test("null vector ELEMENTS null the result in both eval paths") {
    // codegen path (literal-free so the projection stays compiled)
    val df = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val rows = df.select(call_function("cosine_sim", $"a", $"b").as("c"))
      .collect()
    assert(rows(0).isNullAt(0), "null element must null the result")
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
    // interpreted path
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS c").head()
    assert(r.isNullAt(0))
  }

  test("interpreted eval and codegen agree on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val viaExpr = df.select(call_function("cosine_sim", $"a", $"b"))
      .as[Double].collect()
    val viaKernel = rows.map { case (a, b) =>
      graft.ops.Similarity.dotArr(a, b) /
        (math.sqrt(graft.ops.Similarity.dotArr(a, a)) *
          math.sqrt(graft.ops.Similarity.dotArr(b, b)))
    }
    viaExpr.zip(viaKernel).foreach { case (x, y) =>
      assert(x == y, "codegen vs kernel not bit-identical")
    }
  }

  test("mismatched lengths fold over the common prefix (all accumulators)") {
    // dot, |a|², |b|² all run over min(len) — identical prefixes give 1.0
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 5.0d, 9.0d), array(1.0d, 5.0d)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12) // sqrt(26)² != 26 exactly
  }

  test("pii_redact is a SQL-callable expression macro, not a UDF") {
    val r = spark.sql(
      "SELECT pii_redact('mail a@b.io, see https://x.y/z, ip 10.0.0.1, tel 555-123-4567') AS t")
    // note: [^\s]+ greedily takes the comma after the URL — by design
    // (URLs legitimately contain commas; only whitespace terminates)
    assert(r.head().getString(0) ==
      "mail <EMAIL>, see <URL> ip <IP>, tel <PHONE>")
    // macro expansion: the analyzed plan contains the native
    // regexp_replace chain, never a ScalaUDF node
    val analyzed = r.queryExecution.analyzed.toString
    assert(analyzed.contains("regexp_replace"), analyzed)
    assert(!analyzed.contains("UDF"), s"pii_redact must expand to native expressions:\n$analyzed")
    // equals the Column-API form on real data
    val viaSql = graft.Tables.t(spark, sfDir, "documents")
      .limit(50).createOrReplaceTempView("pii_docs")
    val a = spark.sql("SELECT doc_id, pii_redact(text) AS t FROM pii_docs ORDER BY doc_id")
      .collect().map(_.toSeq)
    val b = spark.table("pii_docs")
      .select($"doc_id", graft.ops.TextAnalysis.redactPii($"text").as("t"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("HLL: registers are bit-equal under any split/merge order; estimate within bounds") {
    import graft.functions.HllAggregator
    val agg = new HllAggregator()
    def regsOf(values: Seq[Long], nSplits: Int, reverse: Boolean): Array[Byte] = {
      val chunks = values.zipWithIndex.groupBy(_._2 % nSplits).toSeq
        .sortBy(_._1).map(_._2.map(_._1))
      val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      (if (reverse) bufs.reverse else bufs).foldLeft(agg.zero)(agg.merge)
    }
    // xxhash64-like spread via a splitmix finalizer over dense ids
    def mix(x0: Long): Long = {
      var x = x0 + -7046029254386353131L
      x = (x ^ (x >>> 30)) * -4658895280553007687L
      x = (x ^ (x >>> 27)) * -7723592293110705685L
      x ^ (x >>> 31)
    }
    Seq(100, 3000, 50000).foreach { n =>
      val values = (1L to n.toLong).map(mix)
      val single = regsOf(values, 1, reverse = false)
      Seq((3, false), (8, true), (32, false)).foreach { case (k, rev) =>
        assert(java.util.Arrays.equals(single, regsOf(values, k, rev)),
          s"n=$n: registers must be bit-equal under $k-way split (rev=$rev)")
      }
      val est = HllAggregator.estimate(single)
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.05, s"n=$n: estimate $est off by ${err * 100}%")
      // duplicates are idempotent: feeding everything twice changes nothing
      val doubled = (values ++ values).foldLeft(agg.zero)(agg.reduce)
      assert(java.util.Arrays.equals(single, doubled),
        s"n=$n: re-delivered values must not move the registers")
    }
    // the registered dq row on real data: bounds_ok carries the
    // within-HllRelBound claim the oracle asserts
    val row = graft.queries.QualityQueries.dqUniqueHll(spark, sfDir).head()
    assert(row.getBoolean(2), s"real-data estimate out of bounds: $row")
  }

  test("ScalaCheck: Misra-Gries superset guarantee survives adversarial splits and merge orders") {
    import org.scalacheck.Gen
    import graft.functions.MisraGriesAggregator
    // skewed vocab: a few planted heavies over a long tail
    val genItem = Gen.frequency(
      8 -> Gen.oneOf("hot1", "hot2"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3"),
      5 -> Gen.choose(0, 500).map("tail" + _))
    val genCase = for {
      n <- Gen.choose(50, 800)
      items <- Gen.listOfN(n, genItem)
      k <- Gen.oneOf(3, 7, 15)
      nSplits <- Gen.choose(1, 8)
    } yield (items, k, nSplits)
    (0 until 12).foreach { seed =>
      genCase.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).foreach { case (items, k, nSplits) =>
        val agg = new MisraGriesAggregator(k)
        // partition round-robin, reduce each chunk, then merge in a
        // seed-dependent adversarial order (reversed / interleaved)
        val chunks = items.zipWithIndex.groupBy(_._2 % nSplits).toSeq
          .sortBy(_._1).map(_._2.map(_._1))
        val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val ordered = if (seed % 2 == 0) buffers.reverse else
          buffers.indices.sortBy(i => (i % 2, i)).map(buffers)
        val sketch = ordered.foldLeft(agg.zero)(agg.merge)
        assert(sketch.size <= k, s"seed $seed: sketch exceeded $k counters")
        val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val n = items.size.toLong
        val mustHold = exact.filter { case (_, f) => f > n / (k + 1) }.keySet
        assert(mustHold.subsetOf(sketch.keySet),
          s"seed $seed: lost guaranteed heavies ${mustHold -- sketch.keySet} (n=$n k=$k)")
        sketch.foreach { case (t, est) =>
          val f = exact.getOrElse(t, 0L)
          assert(est <= f && est >= f - n / (k + 1),
            s"seed $seed: estimate $est outside [f - n/(k+1), f] for $t (f=$f)")
        }
      }
    }
    // op level: sketch+verify output == the exact heavy-hitter set
    val docs = Seq(
      (1L, "alpha alpha alpha alpha beta beta gamma delta"),
      (2L, "alpha alpha beta beta beta epsilon zeta eta"),
      (3L, "alpha beta theta iota kappa lambda mu nu")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.heavyHittersOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 24 tokens; threshold freq*32 > 24 -> freq >= 1 ... every token
    // qualifies at this size, so shrink via the exact definition
    val toks = Seq.fill(1)(()).flatMap(_ => Seq(
      "alpha alpha alpha alpha beta beta gamma delta",
      "alpha alpha beta beta beta epsilon zeta eta",
      "alpha beta theta iota kappa lambda mu nu"))
      .flatMap(_.split(" "))
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      .filter { case (_, f) => f * graft.ops.TextAnalysis.HhPhiInv > toks.size }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    assert(got == exact, s"op output $got != exact $exact")
    // empty corpus degrades to an empty frame, not a crash
    assert(graft.ops.TextAnalysis.heavyHittersOf(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() == 0L)
  }

  test("ScalaCheck: count-min sketch is merge-order-invariant and never under-counts") {
    import org.scalacheck.Gen
    import graft.functions.CountMinAggregator
    val depth = 4
    val width = 64 // narrow on purpose: collisions must actually happen
    val agg = new CountMinAggregator(depth, width)
    val genItem = Gen.frequency(
      6 -> Gen.oneOf("hot1", "hot2"),
      4 -> Gen.choose(0, 300).map("tail" + _))
    val genCase = for {
      n <- Gen.choose(50, 600)
      items <- Gen.listOfN(n, genItem)
      nSplits <- Gen.choose(1, 8)
    } yield (items, nSplits)
    (0 until 12).foreach { seed =>
      genCase.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).foreach { case (items, nSplits) =>
        val cells = items.map(t => CountMinAggregator.cellsOf(t, depth, width).toSeq)
        val single = cells.foldLeft(agg.zero)(agg.reduce)
        // adversarial split + merge order must be bit-equal (sums commute)
        val chunks = cells.zipWithIndex.groupBy(_._2 % nSplits).toSeq
          .sortBy(_._1).map(_._2.map(_._1))
        val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val ordered = if (seed % 2 == 0) bufs.reverse else
          bufs.indices.sortBy(i => (i % 2, i)).map(bufs)
        val merged = ordered.foldLeft(agg.zero)(agg.merge)
        assert(java.util.Arrays.equals(single, merged),
          s"seed $seed: sketch must be bit-equal under $nSplits-way merge")
        // one-sided error: estimate >= exact for EVERY token (incl. absent)
        val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        (exact.keys.toSeq :+ "never-seen").foreach { t =>
          val est = CountMinAggregator.estimate(
            single, CountMinAggregator.cellsOf(t, depth, width), width)
          assert(est >= exact.getOrElse(t, 0L),
            s"seed $seed: CMS under-counted $t: $est < ${exact.getOrElse(t, 0L)}")
        }
        // total mass per row is exactly n — sums never lose anything
        (0 until depth).foreach { r =>
          val mass = (0 until width).map(c => single(r * width + c)).sum
          assert(mass == items.size.toLong, s"seed $seed row $r mass $mass != n")
        }
      }
    }
    // op level: estimates vs exact counts on a tiny corpus; the planted
    // absent probe must report exact 0 and overcount = est
    val docs = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta beta delta")).toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.cmsFreqOf(
        docs, Seq("alpha", "beta", "gamma", "zzzabsentprobe"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("alpha")._2 == 3L && rows("beta")._2 == 3L &&
      rows("gamma")._2 == 1L && rows("zzzabsentprobe")._2 == 0L)
    rows.values.foreach { case (est, exact, over) =>
      assert(est >= exact && over == est - exact)
    }
    // at width 4096 and 7 distinct tokens, collisions are essentially
    // impossible — estimates should be exact here
    assert(rows("alpha")._1 == 3L && rows("zzzabsentprobe")._1 == 0L)
  }
}
