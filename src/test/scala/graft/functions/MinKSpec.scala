package graft.functions

import graft.SparkSpec

/** The BoundedMinK family's lossless-summary contract, driven by
  * hand-rolled deterministic generators (scalatestplus is not in the
  * offline cache): for ANY element stream, ANY partition split, and
  * ANY merge order, the aggregator's finish equals the reference
  * `stream.sorted(ord).take(k)` — min-k is exact, not approximate.
  * Also pins the r17 additions: the descending-key variants' orders
  * and the k ≤ 0 constructor guard (ADVICE r16: the reduce fast-path
  * would otherwise throw NoSuchElementException on b.last).
  */
class MinKSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(0x17c4)

  private def randPairs(n: Int): Seq[(String, Long)] =
    (0 until n).map(_ =>
      (f"${rng.nextInt(50)}%02d", rng.nextInt(40).toLong))

  private def foldSplit[T](agg: BoundedMinKAggregator[T],
      xs: Seq[T], splits: Int, reverseMerge: Boolean): Seq[T] = {
    val parts =
      if (splits <= 1) Seq(xs)
      else xs.grouped(math.max(1, xs.length / splits + 1)).toSeq
    val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val ordered = if (reverseMerge) buffers.reverse else buffers
    agg.finish(ordered.foldLeft(agg.zero)(agg.merge))
  }

  test("min-k equals sorted.take(k) under any split and merge order") {
    for (k <- Seq(1, 3, 10, 100); n <- Seq(0, 1, 7, 200)) {
      val xs = randPairs(n)
      val want = xs.sorted.take(k)
      val agg = new MinKPairsAggregator(k)
      for (splits <- Seq(1, 3, 8); rev <- Seq(false, true)) {
        assert(foldSplit(agg, xs, splits, rev) == want,
          s"k=$k n=$n splits=$splits rev=$rev")
      }
    }
  }

  test("TopKByScore: score DESC, id ASC — the dsir selection order") {
    val xs = (0 until 300).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong)).distinct
    val want = xs.sortBy { case (sc, id) => (-sc, id) }.take(10)
    val agg = new TopKByScoreAggregator(10)
    for (splits <- Seq(1, 4); rev <- Seq(false, true))
      assert(foldSplit(agg, xs, splits, rev) == want)
  }

  test("TopKCounted: count DESC, item ASC — the ngram-top order") {
    val xs = (0 until 300).map(_ =>
      (rng.nextInt(15).toLong, f"w${rng.nextInt(80)}%02d")).distinct
    val want = xs.sortBy { case (n, w) => (-n, w) }.take(5)
    val agg = new TopKCountedAggregator(5)
    for (splits <- Seq(1, 4); rev <- Seq(false, true))
      assert(foldSplit(agg, xs, splits, rev) == want)
  }

  test("duplicate elements survive with multiplicity (stable insertion)") {
    val xs = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("b", 2L))
    assert(foldSplit(new MinKPairsAggregator(3), xs, 1, false) ==
      Seq(("a", 1L), ("a", 1L), ("a", 1L)))
  }

  test("k <= 0 is refused at construction (ADVICE r16)") {
    intercept[IllegalArgumentException](new MinKPairsAggregator(0))
    intercept[IllegalArgumentException](new TopKByScoreAggregator(-1))
  }

  test("buffer never exceeds k during a long fold") {
    val agg = new MinKPairsAggregator(4)
    val fin = randPairs(5000).foldLeft(agg.zero) { (b, x) =>
      val nb = agg.reduce(b, x)
      assert(nb.length <= 4)
      nb
    }
    assert(fin == randPairs(0).++(fin)) // shape sanity: still a Seq
    assert(fin.length == 4)
  }
}
