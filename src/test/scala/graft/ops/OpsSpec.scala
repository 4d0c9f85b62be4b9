package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: distinct word 3-grams; short docs yield empty") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x x x x x"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L).isEmpty)
    assert(m(3L) == Seq("x x x")) // distinct collapses repeats
  }

  test("shingle profile: bands partition the shingle space; pair mass replays") {
    import org.apache.spark.sql.functions._
    val got = Dedup.dedupShingleProfile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // independent replay from the raw shingle table
    val dfs = Dedup.shingledOf(
        graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text")))
      .groupBy(col("sh")).count().collect().map(_.getLong(1))
    assert(got.map(_._2).sum == dfs.length, "bands partition distinct shingles")
    assert(got.map(_._3).sum == dfs.sum, "postings conserve")
    val wantPairMass = dfs.map(d => d * (d - 1) / 2).sum
    assert(got.map(_._4).sum == wantPairMass, "uncapped pair mass replays")
    // the fixture corpus has repeated shingles -> at least two bands
    assert(got.length >= 2, s"degenerate profile: ${got.toSeq}")
  }

  test("cluster sizes: histogram conserves docs; multi-clusters match components") {
    val nDocs = graft.Tables.t(spark, sfDir, "documents").count()
    val hist = Dedup.dedupClusterSizes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hist.map(_._3).sum == nDocs, "every doc lands in one cluster")
    hist.foreach { case (sz, nc, nd, nr) =>
      assert(nd == sz * nc && nr == (sz - 1L) * nc)
    }
    // keep-one-per-cluster savings = docs minus clusters
    assert(hist.map(_._4).sum == nDocs - hist.map(_._2).sum)
    // the multi-doc rows re-derive the components' cluster count
    val multi = Dedup.dedupComponents(spark, sfDir)
      .groupBy($"component_id").count().count()
    assert(hist.filter(_._1 > 1L).map(_._2).sum == multi,
      "non-singleton clusters must equal the components output")
    assert(hist.exists(_._1 > 1L), "fixture corpus has near-dup clusters")
  }

  test("jaccard histogram: valid bands, suffix-sum cumulative, >=0.8 mass == verify") {
    val rows = Dedup.dedupJaccardHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, c) =>
      assert(b >= 0 && b <= 10 && n >= 1 && c >= n)
    }
    val sorted = rows.sortBy(-_._1)
    assert(sorted.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      sorted.map(_._3).toSeq, "n_cum must be the suffix sum over bands")
    // the histogram's >= 0.8 mass is exactly the pairs the registered
    // exact-jaccard dedup finds at its 0.8 threshold
    val cum08 = rows.filter(_._1 >= 8).map(_._2).sum
    val ngram = Dedup.dedupNgramJaccard(spark, sfDir).count()
    assert(cum08 == ngram, s"hist >=0.8 mass $cum08 != ngram pairs $ngram")
  }

  test("containment histogram: valid bands, suffix-sum cumulative, >=0.9 mass == verify") {
    val rows = Dedup.dedupContainmentHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, c) =>
      assert(b >= 0 && b <= 10 && n >= 1 && c >= n)
    }
    val sorted = rows.sortBy(-_._1)
    assert(sorted.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      sorted.map(_._3).toSeq, "n_cum must be the suffix sum over bands")
    // containment >= 0.9 ⇔ 10·inter >= 9·min ⇔ band ∈ {9, 10}, so the
    // >= 0.9 mass equals the registered containment dedup's pair count
    val cum09 = rows.filter(_._1 >= 9).map(_._2).sum
    val contain = Dedup.dedupContainment(spark, sfDir).count()
    assert(cum09 == contain,
      s"hist >=0.9 mass $cum09 != containment pairs $contain")
    // subset duplicates cliff under containment: the fixture corpus
    // must put mass at the top band (full containment)
    assert(rows.exists(_._1 == 10L), "expected exact-containment mass")
  }

  test("method agreement: planted exact/near/unique docs produce the full Venn") {
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textB2 = (1 to 29).map(i => s"beta$i").mkString(" ") + " CHANGED"
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, textA), (2L, textA), // exact pair — removed by BOTH families
      (3L, textB), (4L, textB2), // near pair only (jaccard ≈ 0.93)
      (5L, textC)).toDF("doc_id", "text")
    val r = Dedup.methodAgreementOf(docs).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 2L, 1L, 2L)),
      s"Venn mismatch: $r")
    assert(r.getDouble(4) == 0.5)
    // degenerate corpus: no duplicates at all → all-zero row, no NaN
    val clean = Seq((1L, textA), (2L, textB), (3L, textC)).toDF("doc_id", "text")
    val z = Dedup.methodAgreementOf(clean).head()
    assert((z.getLong(0), z.getLong(1), z.getLong(2), z.getLong(3),
      z.getDouble(4)) == ((0L, 0L, 0L, 0L, 0.0)))
  }

  test("bloom-prefiltered novelty is exact: equals the plain anti-join") {
    val corpus = (1L to 1000L).map(i => (i, s"corpus-doc-$i"))
      .toDF("doc_id", "text_md5")
    // batch: 50 true duplicates of corpus hashes + 450 novels
    val batch = ((1L to 50L).map(i => (10000L + i, s"corpus-doc-${i * 7}")) ++
      (1L to 450L).map(i => (20000L + i, s"novel-doc-$i")))
      .toDF("doc_id", "text_md5")
    val got = Dedup.bloomNovel(batch, corpus, expectedCorpusItems = 1000L)
      .collect().map(_.getLong(0)).toSet
    val expected = batch.join(corpus.select($"text_md5"), Seq("text_md5"), "left_anti")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected, "bloom acceleration must not change the answer")
    assert(got.size == 450 && got.forall(_ > 20000L),
      "every novel survives (no false negatives), every dup is dropped")
  }

  test("source matrix: planted vendor overlap attributes exactly; global pair mass conserves") {
    import spark.implicits._
    // planted: vendorA/vendorB share one text (2×1 cross pairs),
    // vendorA carries an internal triple (3 pairs), vendorC is clean
    val docs = Seq(
      (1L, "shared doc", "vendorA"), (2L, "shared doc", "vendorA"),
      (3L, "shared doc", "vendorB"),
      (4L, "triple", "vendorA"), (5L, "triple", "vendorA"),
      (6L, "triple", "vendorA"),
      (7L, "clean one", "vendorC"))
    val work = java.nio.file.Files.createTempDirectory("graft-srcmat").toString
    docs.toDF("doc_id", "text", "source")
      .write.parquet(s"$work/documents.parquet")
    val got = Dedup.dedupSourceMatrix(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("vendorA", "vendorA") -> ((4L, 2L)), // 1 pair (shared) + 3 (triple); 2 dup'd texts
      ("vendorA", "vendorB") -> ((2L, 1L)), // 2 docs × 1 doc of "shared doc"
      ("vendorB", "vendorB") -> ((0L, 0L)), // present, clean internally
      ("vendorC", "vendorC") -> ((0L, 0L))), s"got $got")
    // corpus invariant: the matrix partitions the GLOBAL identical-pair
    // mass (within-group pairs split exactly across source cells)
    val matrix = Dedup.dedupSourceMatrix(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    val global = Dedup.dedupExact(spark, sfDir).collect()
      .map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    assert(matrix == global, s"matrix mass $matrix != global pair mass $global")
  }

  test("near source matrix: partitions the LSH pair mass; max jaccard attributed to the right cell") {
    import spark.implicits._
    val pairs = Dedup.dedupMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcOf = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val want = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) => k -> ((ps.size.toLong, ps.map(_._3).max)) }
    val got = Dedup.dedupSourceMatrixNear(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, "near matrix must partition the verified pair mass by source pair")
  }

  test("exact dedup groups identical texts under min doc_id") {
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("docs_tmp")
    val out = df.groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(2L) == 2L && out(9L) == 1L)
  }

  test("simhash: identical docs share signatures; disjoint docs differ") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words describing some other topic entirely here"))
      .toDF("doc_id", "text")
    val sh = docs.select($"doc_id", explode(Dedup.shingles($"text", 3)).as("sh"))
    val sigs = Dedup.simhashSignatures(sh).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 3,
      "disjoint shingle sets should be far in hamming space")
    // banded pairing finds the identical pair
    val pairs = Dedup.simhashPairs(Dedup.simhashSignatures(sh))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash replay oracles are emitted iff the corpus is replay-safe (r12 VERDICT ask #2)") {
    val saved = graft.ops.Similarity.oracleContext
    try {
      // no Verify context → static map only (no orphan keys either way)
      graft.ops.Similarity.oracleContext = None
      assert(!Dedup.oracles.contains("dedup_simhash"))
      // replay-safe corpus → both fnv64/splitmix64 replays are emitted
      graft.ops.Similarity.oracleContext = Some((spark, sfDir))
      val o = Dedup.oracles
      assert(o.contains("dedup_simhash") && o.contains("dedup_simhash_pairs"),
        "ASCII corpus must carry the full replay oracles")
      assert(o("dedup_simhash").contains("RECURSIVE"),
        "the oracle must re-derive hashes, not read frozen literals")
      // divergent corpus → entries omitted, rows-only fallback
      val dir = java.nio.file.Files
        .createTempDirectory("graft-simhashunsafe").toString
      Seq((1L, "has a vertical\u000Btab")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.ops.Similarity.oracleContext = Some((spark, dir))
      assert(!Dedup.oracles.contains("dedup_simhash") &&
        !Dedup.oracles.contains("dedup_simhash_pairs"),
        "an engine-divergent corpus must fall back to rows-only")
    } finally graft.ops.Similarity.oracleContext = saved
  }

  test("minhash LSH + verify finds near-identical docs at jaccard 0.8") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " wX" // ~0.9 jaccard
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val sh = docs
      .select($"doc_id", explode(Dedup.shingles($"text", 3)).as("sh_str"))
      .select($"doc_id", xxhash64($"sh_str").as("sh")) // verify expects long hashes
    val cand = Dedup.candidatePairs(Dedup.lshBuckets(Dedup.minhashSignatures(sh)))
    val verified = Dedup.verifyJaccard(cand, sh, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == Set((1L, 2L)))
  }

  test("ngram-jaccard inverted index agrees with the LSH+verify answer") {
    val a = Dedup.dedupMinhashLsh(spark, sfDir).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.dedupNgramJaccard(spark, sfDir).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.nonEmpty, "sf0.001 corpus contains known near-dups")
  }

  test("edit-distance near-dup: planted typo pair flagged, unrelated docs pass") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank at dawn"
    val work = java.nio.file.Files.createTempDirectory("graft-editdist")
    Seq(
      (1L, base, "en", "src", base.length.toLong),
      // two single-char typos: tiny edit distance, still shares shingles
      (2L, base.replace("quick", "qwick").replace("lazy", "hazy"), "en", "src", base.length.toLong),
      (3L, "entirely different material about ports and cargo and long sea routes",
        "en", "src", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    val pairs = Dedup.dedupEditDistance(spark, work.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 2L),
      s"typo twin must be flagged at distance 2: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc passes")
  }

  test("cross-corpus incremental dedup = full-run pairs restricted to cross pairs") {
    import org.apache.spark.sql.functions.col
    val sets = Dedup.shingleSets(spark, sfDir).cache()
    try {
      val base = sets.filter(col("doc_id") < 250)
      val fresh = sets.filter(col("doc_id") >= 250)
      val cross = Dedup.crossCorpusNearDups(fresh, base)
        .select("a", "b").collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
        .toSet
      val full = Dedup.dedupMinhashLsh(spark, sfDir)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => (a < 250) != (b < 250) }
        .toSet
      assert(cross == full,
        "incremental pairs must equal the full run's cross-split pairs")
      assert(cross.nonEmpty, "sf0.001 corpus has near-dups spanning the split")
    } finally { sets.unpersist(); () }
  }

  test("connected components: transitive chains collapse to the min id") {
    // chain 1-2-3 (no direct 1-3 edge), pair 10-11, chain 20-21-22-23
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (21L, 20L), (21L, 22L), (23L, 22L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("connected components: pointer jumping converges on a 60-node chain") {
    // diameter 60 >> maxIter 20: plain one-hop propagation cannot finish;
    // path doubling must
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.connectedComponents(chain, maxIter = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 60)
    assert(comp.values.forall(_ == 0L), "whole chain must collapse to node 0")
  }

  test("alternating large-star/small-star CC equals label propagation") {
    // mixed shapes: chains, a star, an isolated pair, plus a random
    // sparse graph — both algorithms must produce identical labelings
    val rnd = new scala.util.Random(7)
    val random = (0 until 120).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val shapes = Seq((100L, 101L), (101L, 102L), (102L, 103L),
      (200L, 201L), (200L, 202L), (200L, 203L), (300L, 301L))
    val pairs = (random ++ shapes).toDF("a", "b")
    val viaProp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = Dedup.connectedComponentsAlternating(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars == viaProp)
  }

  test("alternating CC collapses a 200-node path in O(log n) rounds") {
    // diameter 200: one-hop-per-round algorithms would need 200 rounds;
    // the star-contraction pair must finish well inside maxIter=15
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.connectedComponentsAlternating(chain, maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 200)
    assert(comp.values.forall(_ == 0L), "whole path must collapse to node 0")
  }

  test("edit-distance dedup: empty corpus yields an empty result, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dedupEditDistanceOf(empty).count() == 0L)
  }

  // ---- ScalaCheck: the edit-distance kernel's two cost cuts are lossless ----

  /** Plain unbounded Levenshtein — the naive reference the bounded
    * kernel must match (no length-gap prefilter, no early-exit bound).
    */
  private def levNaive(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var i = 1
    while (i <= a.length) {
      var prev = dp(0); dp(0) = i
      var j = 1
      while (j <= b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        prev = cur
        j += 1
      }
      i += 1
    }
    dp(b.length)
  }

  /** The operator's CONTRACT replayed naively: candidates = pairs
    * sharing >= minShared rare (df <= maxDocFreq) distinct word-trigram
    * fnv shingles; verify = UNBOUNDED Levenshtein <= maxDistFrac × the
    * longer length. The Spark form adds the length-gap prefilter and the
    * threshold-bounded early-exit DP — both argued lossless in
    * Dedup.scala; this reference contains neither, so any divergence is
    * a broken argument.
    */
  private def editDistRef(
      docs: Seq[(Long, String)], minShared: Long, maxDistFrac: Double,
      maxDocFreq: Int): Seq[(Long, Long, Long, Long)] = {
    def shingleSet(t: String): Set[Long] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      (0 to ws.length - 3)
        .map(i => Dedup.fnv64(ws.slice(i, i + 3).mkString(" "))).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sh.values.toSeq.flatten.groupBy(identity).map { case (h, xs) => h -> xs.size }
    val rare = sh.map { case (id, st) => id -> st.filter(h => df(h) <= maxDocFreq) }
    (for {
      (a, ta) <- docs
      (b, tb) <- docs
      if a < b && (rare(a) & rare(b)).size >= minShared
      maxLen = math.max(ta.length, tb.length)
      d = levNaive(ta, tb)
      if d.toDouble <= maxDistFrac * maxLen.toDouble
    } yield (a, b, d.toLong, maxLen.toLong)).sortBy(p => (p._1, p._2))
  }

  private def forAllSampled[T](gen: org.scalacheck.Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).foreach(body)
    }

  test("ScalaCheck: blocked+prefiltered+bounded-DP editdist equals the naive unbounded reference") {
    import org.scalacheck.Gen
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    val genDoc = for {
      n <- Gen.choose(6, 14)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    // mutate: k in-place char substitutions — near-dups the length-gap
    // prefilter must NOT kill and the bounded DP must still admit
    def mutate(t: String): Gen[String] = for {
      k <- Gen.choose(1, 3)
      ps <- Gen.listOfN(k, Gen.choose(0, t.length - 1))
      cs <- Gen.listOfN(k, Gen.alphaLowerChar)
    } yield ps.zip(cs).foldLeft(t) { case (acc, (p, c)) => acc.updated(p, c) }
    val genCorpus = for {
      nBase <- Gen.choose(3, 5)
      bases <- Gen.listOfN(nBase, genDoc)
      twins <- Gen.sequence[List[String], String](bases.map(mutate))
      minShared <- Gen.oneOf(2L, 4L)
      maxDistFrac <- Gen.oneOf(0.2, 0.25, 0.4)
      maxDocFreq <- Gen.oneOf(3, 100)
    } yield {
      val docs = (bases ++ twins).zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }
      (docs, minShared, maxDistFrac, maxDocFreq)
    }
    forAllSampled(genCorpus, n = 6) { case (docs, minShared, maxDistFrac, maxDocFreq) =>
      val got = Dedup
        .dedupEditDistanceOf(docs.toDF("doc_id", "text"),
          minShared, maxDistFrac, maxDocFreq)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(p => (p._1, p._2)).toSeq
      val want = editDistRef(docs, minShared, maxDistFrac, maxDocFreq)
      assert(got == want,
        s"kernel diverged (minShared=$minShared frac=$maxDistFrac df=$maxDocFreq):\n got=$got\nwant=$want")
    }
  }

  // ---- ScalaCheck: the containment two-pointer verify is exact ----

  /** The containment operator's CONTRACT replayed naively: candidates
    * = pairs sharing >= 1 rare (df <= maxDocFreq) shingle; containment
    * = |A∩B| / min(|A|,|B|) over the FULL shingle sets via plain Scala
    * Set intersection — no inverted index, no two-pointer walk. Any
    * divergence is a broken kernel or blocking argument.
    */
  private def containRef(
      docs: Seq[(Long, String)], threshold: Double,
      maxDocFreq: Int): Seq[(Long, Long, Double)] = {
    def shingleSet(t: String): Set[Long] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      (0 to ws.length - 3)
        .map(i => Dedup.fnv64(ws.slice(i, i + 3).mkString(" "))).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sh.values.toSeq.flatten.groupBy(identity).map { case (h, xs) => h -> xs.size }
    val rare = sh.map { case (id, st) => id -> st.filter(h => df(h) <= maxDocFreq) }
    (for {
      (a, _) <- docs
      (b, _) <- docs
      if a < b && (rare(a) & rare(b)).nonEmpty
      mn = math.min(sh(a).size, sh(b).size)
      if mn > 0
      c = (sh(a) & sh(b)).size.toDouble / mn
      if c >= threshold
    } yield (a, b, c)).sortBy(p => (p._1, p._2))
  }

  test("ScalaCheck: inverted-index containment equals the naive set-intersection reference") {
    import org.scalacheck.Gen
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    val other = Vector("kilo", "lima", "mike", "november", "oscar",
      "papa", "quebec", "romeo", "sierra", "tango")
    def genDocFrom(vs: Vector[String]) = for {
      n <- Gen.choose(6, 14)
      ws <- Gen.listOfN(n, Gen.oneOf(vs))
    } yield ws.mkString(" ")
    // subset twin: a contiguous word slice — its trigram set is a strict
    // subset of the base's, exactly the containment-not-Jaccard case
    def subsetOf(t: String): Gen[String] = {
      val ws = t.split(" ")
      for {
        st <- Gen.choose(0, ws.length - 4)
        len <- Gen.choose(3, ws.length - st)
      } yield ws.slice(st, st + len).mkString(" ")
    }
    val genCorpus = for {
      nBase <- Gen.choose(3, 5)
      bases <- Gen.listOfN(nBase, genDocFrom(vocab))
      subs <- Gen.sequence[List[String], String](bases.map(subsetOf))
      disjoint <- Gen.listOfN(2, genDocFrom(other)) // never candidates
      threshold <- Gen.oneOf(0.5, 0.9, 1.0)
      maxDocFreq <- Gen.oneOf(2, 100)
    } yield {
      val docs = (bases ++ subs ++ disjoint).zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }
      (docs, threshold, maxDocFreq)
    }
    forAllSampled(genCorpus, n = 6) { case (docs, threshold, maxDocFreq) =>
      val got = Dedup
        .dedupContainmentOf(docs.toDF("doc_id", "text"), threshold, maxDocFreq)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      val want = containRef(docs, threshold, maxDocFreq)
      assert(got == want,
        s"containment diverged (threshold=$threshold df=$maxDocFreq):\n got=$got\nwant=$want")
    }
  }

  test("verifyContainmentSets: min-side-empty candidates are dropped, not NaN-kept") {
    // an empty set makes |A∩B| / min NaN — Scala's >= drops it; the
    // boundary must yield NO row (and no crash), never a NaN row
    val sets = Seq(
      (1L, Array.empty[Long]), (2L, Array(5L, 9L)), (3L, Array(5L, 9L, 11L)))
      .toDF("doc_id", "set")
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val got = Dedup.verifyContainmentSets(cand, sets, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((2L, 3L, 1.0)), s"got ${got.toSeq}")
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("lm-band stratified sample: full band coverage, cap respected, md5-rank draw") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val perdoc = graft.ops.TextAnalysis
      .lmSurprisalOf(graft.Tables.t(spark, sfDir, "documents"))
      .collect()
      .map(r => r.getLong(0) -> math.floor(r.getDouble(3)).toLong).toMap
    val got = Sampling.sampleLmBand(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every band that exists in the per-doc table is represented — the
    // spectrum-preservation claim (a cut would drop whole bands)
    assert(got.map(_._2).toSet == perdoc.values.toSet, "band coverage")
    val byBand = got.groupBy(_._2)
    byBand.foreach { case (band, rows) =>
      assert(rows.length <= Sampling.LmBandCap, s"band $band over cap")
      // kept set = the cap smallest (md5(doc_id), doc_id) of the band
      val want = perdoc.collect { case (id, b) if b == band => id }
        .toSeq.sortBy(id => (md5hex(id.toString), id))
        .take(Sampling.LmBandCap).toSet
      assert(rows.map(_._1).toSet == want, s"band $band draw diverged")
      // ranks are 1..n without gaps
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("neyman allocation: budget follows size x spread; ties break by source") {
    // A: zero variance (S=0, weight 0); B: mean 10, S=10 -> all budget
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "b", 0L), (4L, "b", 20L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.neymanOf(docs, target = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2L, 0.0, 0L), ("b", 2L, 10.0, 10L)))

    // equal weights, odd target: largest-remainder tie -> source asc
    val tied = Seq(
      (1L, "a", 0L), (2L, "a", 20L), (3L, "b", 0L), (4L, "b", 20L))
      .toDF("doc_id", "source", "n_chars")
    val t2 = Sampling.neymanOf(tied, target = 7L).collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(t2.toSeq == Seq(("a", 4L), ("b", 3L)))
    // allocations always sum exactly to the target
    assert(t2.map(_._2).sum == 7L)
  }

  test("poisson bootstrap: draws near n per replicate; JVM threshold replay") {
    val got = Sampling.samplePoissonBootstrap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.length == Sampling.BootstrapReplicates)
    val n = graft.Tables.t(spark, sfDir, "documents").count()
    val md = java.security.MessageDigest.getInstance("MD5")
    def kOf(b: Long, id: Long): Long = {
      val hx = md.digest(s"boot:$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Sampling.PoissonCumHex.count(t => hx >= t).toLong
    }
    val chars = graft.Tables.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    got.foreach { case (b, nDocs, nDropped, draws, mean) =>
      assert(nDocs == n)
      // full JVM replay of the hex-threshold draw
      val ks = chars.map { case (id, nc) => (kOf(b, id), nc) }
      assert(draws == ks.map(_._1).sum, s"replicate $b draws mismatch")
      assert(nDropped == ks.count(_._1 == 0L))
      val wantMean = ks.map { case (k, nc) => k * nc }.sum.toDouble /
        ks.map(_._1).sum.toDouble
      assert(mean == wantMean, s"replicate $b mean mismatch")
      // E[draws] = n, sd = sqrt(n): stay within ~4 sigma of Poisson mass
      assert(math.abs(draws - n) < 4 * math.sqrt(n.toDouble) + 8,
        s"replicate $b drew $draws of $n")
    }
    // replicate draws are genuinely different
    assert(got.map(_._4).distinct.length > 1, "replicates must differ")
  }

  test("ScalaCheck: neyman allocations are non-negative and sum exactly to target") {
    import org.scalacheck.Gen
    val genStrata = for {
      k <- Gen.choose(1, 5)
      target <- Gen.choose(1L, 200L)
      strata <- Gen.listOfN(k, Gen.nonEmptyListOf(Gen.choose(0L, 50L)))
    } yield (target, strata)
    (0 until 40).foreach { seed =>
      genStrata(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).foreach { case (target, strata) =>
        val docs = strata.zipWithIndex.flatMap { case (lens, si) =>
          lens.zipWithIndex.map { case (len, di) =>
            ((si * 1000 + di).toLong, s"s$si", len)
          }
        }.toDF("doc_id", "source", "n_chars")
        val got = Sampling.neymanOf(docs, target).collect()
          .map(r => r.getString(0) -> r.getLong(3))
        assert(got.map(_._2).sum == target,
          s"seed $seed: allocations ${got.toSeq} must sum to $target")
        assert(got.forall(_._2 >= 0L), s"seed $seed: negative allocation")
        // all-constant strata (zero weight everywhere) still allocate
        assert(got.length == strata.length)
      }
    }
  }

  test("hash split: deterministic membership, disjoint and complete") {
    val df = (1L to 2000L).toDF("id")
    val once = Sampling.hashSplit(df, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Sampling.hashSplit(df.repartition(7), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again, "split must not depend on partitioning")
    assert(once.size == 2000)
    val shares = once.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(shares("train") - 0.80) < 0.04, s"train share ${shares("train")}")
    assert(math.abs(shares("val") - 0.10) < 0.03)
    assert(math.abs(shares("test") - 0.10) < 0.03)
  }

  test("group split: components never span folds; a doc-keyed split would leak") {
    // splitColumn replayed in plain JVM md5 (same cast-to-string input)
    val md = java.security.MessageDigest.getInstance("MD5")
    def foldOf(id: Long): String = {
      val h = TextAnalysis.md5Hex(md,
        id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (h < Sampling.TrainUpper) "train"
      else if (h < Sampling.ValUpper) "val" else "test"
    }
    val comps = Dedup.dedupComponents(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.nonEmpty && comps.exists { case (d, c) => d != c },
      "fixture must contain multi-doc near-dup components")
    // group-keyed: all docs of a component share the component's fold —
    // and the naive doc-keyed split WOULD scatter at least one component
    // (the leakage this operator exists to prevent is present in data)
    val scattered = comps.groupBy(_._2).exists { case (_, members) =>
      members.keys.map(foldOf).toSet.size > 1
    }
    assert(scattered, "fixture too small to demonstrate doc-keyed leakage")
    // summary conserves the corpus and matches the JVM fold replay
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val wantDocs = ids.groupBy(id => foldOf(comps.getOrElse(id, id)))
      .view.mapValues(_.length.toLong).toMap
    val sum = Sampling.sampleGroupSplit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(sum == wantDocs, s"got $sum want $wantDocs")
    assert(sum.values.sum == ids.length)
  }

  test("per-source cap: exact cap enforced, small sources untouched, counts consistent") {
    val got = Sampling.capPerSourceSummary(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (src, nDocs, nKept) =>
      assert(nKept == math.min(nDocs, Sampling.CapPerSource.toLong),
        s"source $src: kept $nKept of $nDocs under cap ${Sampling.CapPerSource}")
    }
    assert(got.exists(_._2 > Sampling.CapPerSource.toLong),
      "test data must exercise the capped branch")
  }

  test("unimax: budget exactly spent, both binding regimes, water-filling order-free") {
    val rows = Sampling.sampleUnimax(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    // the budget is exactly spent when total capacity exceeds it
    val totalCap = rows.map(_._4).sum
    assert(totalCap > Sampling.UnimaxBudget, "test corpus must be budget-bound")
    assert(rows.map(_._5).sum == Sampling.UnimaxBudget, "alloc must sum to budget")
    rows.foreach { case (src, _, total, cap, alloc, nKept, keptToks, _) =>
      assert(cap == total * Sampling.UnimaxEpochs)
      assert(alloc <= cap, s"$src alloc over capacity")
      assert(keptToks <= alloc, s"$src kept tokens over alloc")
      assert(nKept >= 0 && keptToks >= 0)
    }
    // both regimes: some source fully used at capacity, some share-bound
    assert(rows.exists(r => r._5 == r._4), "a scarce source must bind on capacity")
    assert(rows.exists(r => r._5 < r._4), "an abundant source must bind on share")
    // water-filling: every share-bound source gets one of (at most) two
    // adjacent share values (integer-division crumbs), both >= any
    // capacity-bound alloc
    val shareBound = rows.filter(r => r._5 < r._4).map(_._5)
    assert(shareBound.distinct.length <= 2,
      s"share-bound allocs must be near-equal, got ${shareBound.distinct.toSeq}")
    val capBound = rows.filter(r => r._5 == r._4).map(_._5)
    if (capBound.nonEmpty && shareBound.nonEmpty)
      assert(capBound.max <= shareBound.min,
        "capacity-bound sources take less than the fair share")
    // budget above total capacity: every source fully used, selection =
    // the whole corpus x epochs
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val all = Sampling.unimaxOf(docs, budget = totalCap + 1000L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(6)))
    all.foreach { case (src, cap, alloc, keptToks) =>
      assert(alloc == cap && keptToks == cap,
        s"$src under an unconstrained budget must be fully used")
    }
    // selection membership must not depend on the partition count
    val a1 = Sampling.unimaxOf(docs, partitions = 1).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6), r.getLong(7)))
    val a7 = Sampling.unimaxOf(docs, partitions = 7).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(a1.sameElements(a7), "selection must not depend on partitioning")
  }

  test("ScalaCheck: unimax allocator spends exactly, respects caps, ignores input order") {
    import org.scalacheck.Gen
    val genCase = for {
      k <- Gen.choose(1, 30)
      caps <- Gen.listOfN(k, Gen.choose(0L, 5000L))
      budget <- Gen.choose(0L, 80000L)
    } yield (caps.zipWithIndex.map { case (c, i) => s"s$i" -> c }, budget)
    (0 until 20).foreach { seed =>
      genCase.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).foreach { case (caps, budget) =>
        val alloc = Sampling.unimaxAllocate(caps, budget)
        val capOf = caps.toMap
        // caps respected, allocations non-negative
        alloc.foreach { case (s2, a) =>
          assert(a >= 0L && a <= capOf(s2), s"seed $seed: $s2 alloc $a cap ${capOf(s2)}")
        }
        // spend = min(budget, total capacity) up to integer-division
        // crumbs: crumbs only remain when NO source is share-bound
        // (everyone capped), in which case spend == total capacity
        val spent = alloc.values.sum
        val totalCap = caps.map(_._2).sum
        if (totalCap <= budget) assert(spent == totalCap, s"seed $seed: under-capacity spend")
        else assert(spent <= budget &&
          spent >= budget - caps.length, s"seed $seed: spend $spent of $budget")
        // share-bound sources (alloc < cap) get one of at most two
        // adjacent values and never less than any capped source's alloc
        val shareBound = alloc.filter { case (s2, a) => a < capOf(s2) }.values.toSeq
        if (shareBound.nonEmpty) {
          assert(shareBound.max - shareBound.min <= 1,
            s"seed $seed: share-bound allocs ${shareBound.distinct.sorted}")
          val capBound = alloc.filter { case (s2, a) => a == capOf(s2) }
          // every fully-used source has capacity <= the fair share it
          // would otherwise have received
          capBound.foreach { case (s2, a) =>
            assert(a <= shareBound.max, s"seed $seed: capped $s2=$a > share ${shareBound.max}")
          }
        }
        // input order must not matter
        val shuffled = Sampling.unimaxAllocate(caps.reverse, budget)
        assert(shuffled == alloc, s"seed $seed: order-dependent allocation")
      }
    }
  }

  test("stratified sample keeps ~fraction of every class, deterministically") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "cls")
    val kept = Sampling.stratifiedSample(df, "id", 0.25)
    val byCls = kept.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byCls("a") / 1000.0 - 0.25) < 0.06)
    assert(math.abs(byCls("b") / 2000.0 - 0.25) < 0.06)
    // re-evaluation returns the identical member set
    val ids1 = kept.select("id").as[Long].collect().toSet
    val ids2 = Sampling.stratifiedSample(df.repartition(5), "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("temperature sampling flattens big domains, keeps small ones whole") {
    val rows = Sampling.temperatureSummary(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, cutoff, nKept, _) =>
      val expected = math.min(1.0, Sampling.TempK / math.sqrt(nDocs.toDouble))
      assert(cutoff == math.floor(expected * 65536.0).toLong)
      assert(nKept <= nDocs)
      if (cutoff >= 65536L) assert(nKept == nDocs, "domains under K^2 docs kept whole")
      // hash-uniform: kept share tracks the cutoff within binomial noise
      else {
        val share = nKept.toDouble / nDocs
        val p = cutoff / 65536.0
        assert(math.abs(share - p) < 4 * math.sqrt(p * (1 - p) / nDocs) + 0.02,
          s"share $share vs p $p over $nDocs docs")
      }
    }
    // a domain with more docs never keeps a LARGER fraction
    val fracs = rows.filter(_._2 > 0)
      .map { case (_, n, _, k, _) => (n, k.toDouble / n) }.sortBy(_._1)
    fracs.sliding(2).foreach {
      case Array((n1, f1), (n2, f2)) if n1 < n2 => assert(f2 <= f1 + 0.05)
      case _ => ()
    }
  }

  test("reservoir sample: deterministic top-k by md5, heap plan, no global sort") {
    val got = Sampling.sampleReservoir(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.length == Sampling.ReservoirK)
    // membership = the k smallest md5 hashes — recomputable ground truth
    val all = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", md5($"doc_id".cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, h) => (h, id) }.take(Sampling.ReservoirK)
    assert(got.toSeq == all.toSeq, "sample must be the exact k-smallest-hash set")
    // the plan must be a per-partition heap + driver merge, not a sort
    val plan = Sampling.sampleReservoir(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject, got:\n$plan")
  }

  test("k-center: bit-exact vs in-memory farthest-point replay; radii nonincreasing") {
    val k = Sampling.KCenterK
    val got = Sampling.sampleKCenter(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // naive greedy with the SAME left-to-right fold order
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val mind = scala.collection.mutable.Map(
      vecs.map(v => v._1 -> Double.MaxValue): _*)
    var center = vecs.head._2
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)](
      (0L, vecs.head._1, 0.0))
    (1 until k).foreach { rank =>
      vecs.foreach { case (id, v) =>
        mind(id) = math.min(mind(id), d2(v, center))
      }
      val chosen = want.map(_._2).toSet
      val next = vecs.filter(v => !chosen(v._1))
        .map { case (id, v) => (id, mind(id), v) }
        .minBy { case (id, d, _) => (-d, id) }
      center = next._3
      want += ((rank.toLong, next._1, next._2))
    }
    assert(got.toSeq == want.toSeq, "greedy trace must match the replay exactly")
    // coverage radii nonincreasing after the seed
    got.drop(1).map(_._3).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) >= w(1), "radius sequence must be nonincreasing")
    }
  }
}

class SimilaritySpec extends SparkSpec {

  /** Naive margin-mining replay with the identical fold orders. */
  private def bitextRef(
      xs: Seq[(Long, Array[Double])], ys: Seq[(Long, Array[Double])],
      k: Int): Seq[(Long, Long, Double, Double)] = {
    def cos(a: Array[Double], b: Array[Double]) =
      Similarity.dotArr(a, b) /
        (math.sqrt(Similarity.dotArr(a, a)) * math.sqrt(Similarity.dotArr(b, b)))
    val p = for { (xi, xv) <- xs; (yi, yv) <- ys } yield (xi, yi, cos(xv, yv))
    val ax = p.groupBy(_._1).map { case (xi, rows) =>
      xi -> rows.map(r => (r._3, r._2)).sortBy { case (c, y) => (-c, y) }
        .take(k).map(_._1).foldLeft(0.0)(_ + _) / k
    }
    val ay = p.groupBy(_._2).map { case (yi, rows) =>
      yi -> rows.map(r => (r._3, r._1)).sortBy { case (c, x) => (-c, x) }
        .take(k).map(_._1).foldLeft(0.0)(_ + _) / k
    }
    p.map { case (xi, yi, c) => (xi, yi, c, c / ((ax(xi) + ay(yi)) / 2.0)) }
      .groupBy(_._1).map { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).head
      }.toSeq.sortBy(_._1)
  }

  test("bitext mining: margin suppresses the hub a raw-cosine miner would pick") {
    import spark.implicits._
    // y3 is a HUB: cos 1/sqrt(3) to EVERY x — the highest raw cosine for
    // x0. y1 aligns only with x0 (cos 0.55 < the hub's 0.577) but has a
    // sparse neighborhood, so the margin flips the choice to y1 — the
    // published reason margin mining beats raw cosine (Artetxe & Schwenk).
    val xs = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (4L, Array(0.0, 0.0, 1.0, 0.0)))
    val ys = Seq(
      (1L, Array(0.55, 0.0, 0.0, 0.835)),
      (3L, Array(1.0, 1.0, 1.0, 0.0)), // the hub
      (5L, Array(0.0, 0.6, 0.0, 0.8)),
      (7L, Array(0.0, 0.0, 0.7, 0.714)))
    val got = Similarity.bitextOf(
        xs.toDF("x_id", "xv"), ys.toDF("y_id", "yv"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val want = bitextRef(xs, ys, k = 2)
    assert(got == want, s"\n got=$got\nwant=$want")
    // raw cosine for x0 prefers the hub; the margin must pick y1
    val rawBest = ys.map { case (yi, yv) =>
      (yi, Similarity.dotArr(xs.head._2, yv) /
        (math.sqrt(Similarity.dotArr(xs.head._2, xs.head._2)) *
          math.sqrt(Similarity.dotArr(yv, yv))))
    }.maxBy(_._2)._1
    assert(rawBest == 3L, "test construction: the hub must win on raw cosine")
    assert(got.find(_._1 == 0L).get._2 == 1L,
      s"margin must suppress the hub for x0: ${got.find(_._1 == 0L)}")
  }

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  lazy val brute: Map[Long, Set[Long]] = topkSet(Similarity.simBruteTopK(spark, sfDir))

  test("brute-force topk: k results per query, no self-matches") {
    assert(brute.size == Similarity.NumQueries)
    assert(brute.forall(_._2.size == Similarity.TopK))
    assert(brute.forall { case (q, cands) => !cands.contains(q) })
  }

  test("ood outliers: exactly the bottom-N assignment cosines (independent replay)") {
    import org.apache.spark.sql.functions._
    val got = Similarity.simOodOutliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getDouble(2)))
    assert(got.length == Similarity.OodTopN)
    assert(got.map(_._1).distinct.length == got.length, "distinct vectors")
    val order = got.map(r => (r._3, r._1))
    assert(order.toSeq == order.sortBy(identity).toSeq,
      "ascending (cos, vec_id) order")
    // independent replay: a vector's assignment cosine is its MAX cosine
    // over the centroids; the report must be the N smallest such values
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val best = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .crossJoin(broadcast(Similarity.centroidsExact(emb)))
      .select(col("vec_id"), Similarity.cosine(col("e"), col("cent")).as("cos"))
      .groupBy(col("vec_id")).agg(max(col("cos")).as("best"))
      .collect().map(r => (r.getDouble(1), r.getLong(0)))
      .sortBy(x => x).take(Similarity.OodTopN)
    assert(got.map(r => (r._3, r._1)).toSeq == best.toSeq,
      "report must be the global bottom-N of assignment centrality")
  }

  test("label confusion: conserves mined pairs; shares form a distribution") {
    val got = Similarity.simLabelConfusion(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    assert(got.nonEmpty)
    assert(got.map(_._3).sum ==
      Similarity.dedupEmbCosineTiled(spark, sfDir, numBlocks = 8).count(),
      "every mined pair lands in one label cell")
    got.foreach { case (a, b, _, cross, _) =>
      assert(a <= b, "label pair must be canonicalized")
      assert(cross == (a != b))
    }
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-12)
  }

  test("norm histogram: conserves vectors; bands replay from JVM norms") {
    import org.apache.spark.sql.functions._
    val got = Similarity.simNormHist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    assert(got.values.sum == vecs.length)
    val want = vecs
      .map(v => math.floor(math.sqrt(Similarity.dotArr(v, v)) * 10).toLong)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    assert(got == want, s"bands must replay: got $got want $want")
  }

  test("centroid drift: halves partition each label; clustered labels stay near 1") {
    import org.apache.spark.sql.functions._
    val got = Similarity.simCentroidDrift(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.nonEmpty)
    val byLabel = graft.Tables.t(spark, sfDir, "embeddings")
      .groupBy(col("label")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    got.foreach { case (label, na, nb, cos) =>
      assert(na + nb == byLabel(label), s"label $label: halves must partition")
      assert(cos >= -1.0 && cos <= 1.0, s"label $label: cosine bounds, got $cos")
    }
    assert(got.map(_._1).toSet == byLabel.keySet, "every label reported")
    // deterministic: the ordered folds reproduce bit-for-bit
    val again = Similarity.simCentroidDrift(spark, sfDir).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(again.toSeq == got.toSeq)
  }

  test("embcos histogram: suffix-sum cumulative; mass equals the tiled pair pass") {
    val rows = Similarity.dedupEmbCosHist(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, c) =>
      assert(b >= 8L && b <= 20L && n >= 1L && c >= n,
        s"band $b out of the >=0.4 cosine range")
    }
    val sorted = rows.sortBy(-_._1)
    assert(sorted.map(_._2).scanLeft(0L)(_ + _).tail.toSeq ==
      sorted.map(_._3).toSeq, "n_cum must be the suffix sum over bands")
    assert(rows.map(_._2).sum ==
      Similarity.dedupEmbCosineTiled(spark, sfDir, numBlocks = 8).count(),
      "histogram mass must equal the mined pair count")
  }

  test("recall curve: monotone in nprobe; exhaustive probe equals brute force") {
    val got = Similarity.simRecallCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // recall@k is monotone in nprobe: a truth member in top-k at p stays
    // in top-k at p' > p (fewer than k candidates beat it globally)
    got.map(_._3).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1), s"recall not monotone: ${got.toSeq}")
    }
    assert(got.last._3 == 1.0, "exhaustive probing must reach recall 1")
    // the internal truth slice IS the brute-force answer
    assert(got.last._2 == brute.values.map(_.size).sum,
      "truth pair count must equal brute force")
  }

  test("IVF occupancy + recall curve construct without running any data job") {
    // VERDICT r14 ask #5: simRecallCurve ran an eager label count (and
    // an eager truth count + an EAGER kernel checkpoint) at
    // plan-construction time. All three queries must now be pure plan
    // builders — data jobs happen at the first ACTION. The one job
    // class construction legitimately submits is parquet FOOTER
    // schema inference inside Tables.t (driver-side metadata, scale-
    // independent); anything else — a shuffle, an aggregation, a
    // broadcast-relation future (what localCheckpoint(eager=false)
    // fires by forcing physical-plan prep) — is an eager kernel leak.
    val sc = spark.sparkContext
    // force the lazy fixture (sfDir parquet writes) BEFORE the group
    // opens, or its jobs would be charged to the probe
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val stageNames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val group = s"lazy-construction-${System.nanoTime()}"
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          js.stageInfos.foreach(si => stageNames.add(si.name))
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup(group, "construction-laziness probe")
      try {
        Similarity.simIvfBalance(spark, sfDir)
        Similarity.simIvfRebalance(spark, sfDir)
        Similarity.simRecallCurve(spark, sfDir)
      } finally sc.clearJobGroup()
      org.apache.spark.graft.ListenerBusFlush.drain(sc)
      import scala.jdk.CollectionConverters._
      val dataStages = stageNames.asScala.filterNot(_.startsWith("parquet at"))
      assert(dataStages.isEmpty,
        s"plan construction ran data stages: ${dataStages.mkString("; ")}")
    } finally sc.removeSparkListener(listener)
  }

  test("IVF-PQ hybrid: recall >= 0.5 vs brute force; nprobe=k degenerates to exactly sim_pq_ann") {
    val hyb = topkSet(Similarity.simIvfPqANN(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = hyb.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall below bound")
    // the identity anchor: probing every cell removes the IVF gate, so
    // the hybrid must equal the flat PQ tier EXACTLY (same codebook,
    // same ADC, same pool, same re-rank) — rank, id, AND score
    import spark.implicits._
    val k = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"label").distinct().count().toInt
    val full = Similarity.simIvfPqANN(spark, sfDir, nprobe = k).collect()
      .map(_.toSeq).toSeq
    val pq = Similarity.simPqANN(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(full == pq, "nprobe=k hybrid must equal sim_pq_ann exactly")
  }

  test("label-confusion threshold semantics at scale: x4 identical-replica " +
      "matrix equals the analytic form row-for-row") {
    // the r15 ask-#8 gate in permanent form (the x10 run lives in the
    // ScaleSmoke probe): with embeddings byte-unchanged across
    // replicas, every cross-replica cosine is bit-identical to a base
    // cosine, so the 0.40-threshold matrix at x4 is a closed-form
    // function of the base matrix — counts AND shares
    import org.apache.spark.sql.functions._
    val reps = 4
    val dir = graft.ScaleSmoke.ensureSf10EmbIdent(spark, sfDir, reps)
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    def asL(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue()
    val labelBase = e.agg(max(col("label").cast("long"))).head.getLong(0) + 1L
    val hist = e.groupBy(col("label").cast("long").as("l"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = Similarity.simLabelConfusion(spark, sfDir)
      .collect().map(r => (asL(r, 0), asL(r, 1), asL(r, 2))).toSeq
    val want = graft.ScaleSmoke
      .labelConfusionExpected(base, hist, reps, labelBase)
    val total = want.values.sum
    val wantFull = want.map { case (k, c) =>
      k -> ((c, c.toDouble / total.toDouble)) }
    val got = Similarity.simLabelConfusion(spark, dir).collect()
      .map(r => (asL(r, 0), asL(r, 1)) -> ((asL(r, 2), r.getDouble(4))))
      .toMap
    assert(got == wantFull,
      s"missing=${wantFull.keySet.diff(got.keySet)} " +
        s"extra=${got.keySet.diff(wantFull.keySet)} " +
        s"diff=${wantFull.keySet.intersect(got.keySet)
          .filter(k => got(k) != wantFull(k)).take(10)
          .map(k => (k, got(k), wantFull(k)))}")
    // the cross-replica blocks are genuinely exercised (non-vacuous)
    assert(got.keys.exists { case (a, b) =>
      a / labelBase != b / labelBase }, "no cross-replica rows qualified")
  }

  test("IVF-PQ residual tier: recall >= the non-residual tier at equal nprobe") {
    // the by_residual=true claim (FAISS's default for a reason):
    // residuals concentrate near the origin with the coarse structure
    // removed, so the same bits buy more local resolution — at the
    // SAME nprobe, pool width, and re-rank, the residual tier's
    // recall@k vs brute force must be at least the plain tier's
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topkSet(df)
      brute.keys.toSeq.map { q =>
        got.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble /
          Similarity.TopK
      }.sum / brute.size
    }
    val rRes = recallOf(Similarity.simIvfPqResidualANN(spark, sfDir))
    val rPlain = recallOf(Similarity.simIvfPqANN(spark, sfDir))
    assert(rRes >= rPlain,
      s"residual recall $rRes below non-residual $rPlain at equal nprobe")
    assert(rRes >= 0.5, s"residual recall $rRes below the family bound")
  }

  test("frozen IVF-PQ index: serve equals the inline hybrid exactly; appended batches assign against the frozen artifacts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Similarity.writeIvfPqIndex(spark, sfDir, work)
    // one code directory per coarse cell; the model sidecars coexist
    val dirs = new java.io.File(work).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id="))
    assert(dirs.length > 2, s"expected several cell partitions: ${dirs.toSeq}")
    // serve must equal the inline hybrid — rank, id, AND score (same
    // model artifacts, same probe tables, same ADC, same re-rank)
    val served = Similarity.searchIvfPqIndex(spark, sfDir, work)
    val servedRows = served.collect().map(_.toSeq).toSeq
    val inline = Similarity.simIvfPqANN(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(servedRows == inline, "frozen-index serve drifted from the inline hybrid")
    // the probe is a PARTITION FILTER: unprobed cell directories are
    // never opened
    val scans = served.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val idxScan = scans.find(_.contains(work))
    assert(idxScan.exists(p =>
        "PartitionFilters: \\[[^\\]]*cent_id[^\\]]*\\]".r.findFirstIn(p).nonEmpty),
      s"code scan has no cent_id partition filter:\n${scans.mkString("\n")}")
    // append lifecycle: exact twins of served top candidates enter via
    // appendIvfPqBatch (assigned + encoded against the FROZEN
    // artifacts — identical vectors get identical cells and codes), a
    // fixture dir carries them in the primary store, and the served
    // top-k must surface them right next to their originals
    val base = graft.Tables.t(spark, sfDir, "embeddings")
    val twinIds = servedRows.filter(_(1) == 1L).map(_(2).asInstanceOf[Long]).take(5)
    val twins = base.filter($"vec_id".isInCollection(twinIds))
      .select(($"vec_id" + 100000L).as("vec_id"), $"label", $"embedding")
    val fixDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-fix").toString
    base.unionByName(twins).write.parquet(s"$fixDir/embeddings.parquet")
    Similarity.appendIvfPqBatch(spark, work, twins
      .select($"vec_id", $"embedding".cast("array<double>").as("e")))
    val after = Similarity.searchIvfPqIndex(spark, fixDir, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.exists(_._3 >= 100000L),
      s"an appended twin must reach the served top-k: ${after.toSeq.take(10)}")
  }

  test("frozen residual IVF-PQ index: serve equals the inline residual tier exactly; marker blocks cross-tier decoding; appends assign against the frozen artifacts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ivfpqr").toString
    Similarity.writeIvfPqResidualIndex(spark, sfDir, work)
    val served = Similarity.searchIvfPqResidualIndex(spark, sfDir, work)
    val servedRows = served.collect().map(_.toSeq).toSeq
    val inline = Similarity.simIvfPqResidualANN(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(servedRows == inline,
      "frozen residual serve drifted from the inline residual tier")
    // probes are partition filters here too
    val scans = served.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.find(_.contains(work)).exists(p =>
        "PartitionFilters: \\[[^\\]]*cent_id[^\\]]*\\]".r.findFirstIn(p).nonEmpty),
      s"code scan has no cent_id partition filter:\n${scans.mkString("\n")}")
    // the marker is load-bearing: residual codes through the plain
    // decoder (or vice versa) would serve silently wrong scores, so
    // BOTH search paths must refuse the other tier's layout
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqIndex(spark, sfDir, work)
    }
    val plainWork = java.nio.file.Files.createTempDirectory("graft-ivfpqp").toString
    Similarity.writeIvfPqIndex(spark, sfDir, plainWork)
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqResidualIndex(spark, sfDir, plainWork)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqResidualBatch(spark, plainWork,
        graft.Tables.t(spark, sfDir, "embeddings").limit(1)
          .select($"vec_id", $"embedding".cast("array<double>").as("e")))
    }
    // ...and the fourth direction (r16 review finding): the PLAIN
    // append must refuse a residual index — plain-encoded codes in a
    // residual layout would ADC-decode silently wrong
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqBatch(spark, work,
        graft.Tables.t(spark, sfDir, "embeddings").limit(1)
          .select($"vec_id", $"embedding".cast("array<double>").as("e")))
    }
    // append lifecycle: exact twins enter against the FROZEN residual
    // artifacts and must surface in the served top-k beside originals
    val base = graft.Tables.t(spark, sfDir, "embeddings")
    val twinIds = servedRows.filter(_(1) == 1L).map(_(2).asInstanceOf[Long]).take(5)
    val twins = base.filter($"vec_id".isInCollection(twinIds))
      .select(($"vec_id" + 100000L).as("vec_id"), $"label", $"embedding")
    val fixDir = java.nio.file.Files.createTempDirectory("graft-ivfpqr-fix").toString
    base.unionByName(twins).write.parquet(s"$fixDir/embeddings.parquet")
    Similarity.appendIvfPqResidualBatch(spark, work, twins
      .select($"vec_id", $"embedding".cast("array<double>").as("e")))
    val after = Similarity.searchIvfPqResidualIndex(spark, fixDir, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.exists(_._3 >= 100000L),
      s"an appended twin must reach the served top-k: ${after.toSeq.take(10)}")
  }

  test("OPQ rotation: exactly orthogonal; rotation preserves dot products") {
    val r = Similarity.opqRotation()
    val dim = r.length
    // RᵀR == I to float round-off (Householder products are orthogonal
    // by construction — this pins the construction stays one)
    var maxErr = 0.0
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        var acc = 0.0
        var k = 0
        while (k < dim) { acc += r(k)(i) * r(k)(j); k += 1 }
        val want = if (i == j) 1.0 else 0.0
        maxErr = math.max(maxErr, math.abs(acc - want))
        j += 1
      }
      i += 1
    }
    assert(maxErr < 1e-12, s"RtR deviates from I by $maxErr")
    // the ADC-exactness claim: rotations preserve dot products
    val a = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val b = Array.tabulate(dim)(i => math.cos(2.0 * i + 1.0))
    val d0 = Similarity.dotArr(a, b)
    val d1 = Similarity.dotArr(
      Similarity.rotate(r, a), Similarity.rotate(r, b))
    assert(math.abs(d0 - d1) < 1e-12, s"rotation broke the dot: $d0 vs $d1")
  }

  test("IVF-PQ OPQ tier: recall >= the residual tier at equal nprobe") {
    // the OPQ claim (Ge et al. 2013): rotating residuals spreads every
    // original coordinate across all PQ subspaces, so coordinate-
    // aligned structure stops starving individual codebooks — at the
    // SAME nprobe, pool width, and re-rank, recall@k vs brute force
    // must be at least the unrotated residual tier's
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topkSet(df)
      brute.keys.toSeq.map { q =>
        got.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble /
          Similarity.TopK
      }.sum / brute.size
    }
    val rOpq = recallOf(Similarity.simIvfPqOpqANN(spark, sfDir))
    val rRes = recallOf(Similarity.simIvfPqResidualANN(spark, sfDir))
    assert(rOpq >= rRes,
      s"OPQ recall $rOpq below residual $rRes at equal nprobe")
    assert(rOpq >= 0.5, s"OPQ recall $rOpq below the family bound")
  }

  test("frozen OPQ IVF-PQ index: serve equals the inline OPQ tier exactly; tier markers refuse all six cross-tier directions; appends assign against the frozen artifacts") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ivfpqo").toString
    Similarity.writeIvfPqOpqIndex(spark, sfDir, work)
    val served = Similarity.searchIvfPqOpqIndex(spark, sfDir, work)
    val servedRows = served.collect().map(_.toSeq).toSeq
    val inline = Similarity.simIvfPqOpqANN(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(servedRows == inline,
      "frozen OPQ serve drifted from the inline OPQ tier")
    // probes are partition filters here too
    val scans = served.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.find(_.contains(work)).exists(p =>
        "PartitionFilters: \\[[^\\]]*cent_id[^\\]]*\\]".r.findFirstIn(p).nonEmpty),
      s"code scan has no cent_id partition filter:\n${scans.mkString("\n")}")
    // ALL SIX cross-tier directions (3 tiers × search/append guards,
    // one indexTier definition): an OPQ index must refuse the plain
    // and residual paths, and both other layouts must refuse the OPQ
    // paths — rotated codes through any other decoder score silently
    // wrong
    val batch1 = graft.Tables.t(spark, sfDir, "embeddings").limit(1)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqIndex(spark, sfDir, work)
    }
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqResidualIndex(spark, sfDir, work)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqBatch(spark, work, batch1)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqResidualBatch(spark, work, batch1)
    }
    val plainWork = java.nio.file.Files.createTempDirectory("graft-ivfpqo-p").toString
    Similarity.writeIvfPqIndex(spark, sfDir, plainWork)
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPqOpqIndex(spark, sfDir, plainWork)
    }
    intercept[IllegalArgumentException] {
      Similarity.appendIvfPqOpqBatch(spark, plainWork, batch1)
    }
    // append lifecycle: exact twins enter against the FROZEN rotation,
    // centroids and codebook, and must surface in the served top-k
    val base = graft.Tables.t(spark, sfDir, "embeddings")
    val twinIds = servedRows.filter(_(1) == 1L).map(_(2).asInstanceOf[Long]).take(5)
    val twins = base.filter($"vec_id".isInCollection(twinIds))
      .select(($"vec_id" + 100000L).as("vec_id"), $"label", $"embedding")
    val fixDir = java.nio.file.Files.createTempDirectory("graft-ivfpqo-fix").toString
    base.unionByName(twins).write.parquet(s"$fixDir/embeddings.parquet")
    Similarity.appendIvfPqOpqBatch(spark, work, twins
      .select($"vec_id", $"embedding".cast("array<double>").as("e")))
    val after = Similarity.searchIvfPqOpqIndex(spark, fixDir, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.exists(_._3 >= 100000L),
      s"an appended twin must reach the served top-k: ${after.toSeq.take(10)}")
  }

  test("residual recall curve: coverage-monotone to the pool cliff; at the registered " +
      "nprobe it matches the residual query's own recall and rides at or above the plain curve") {
    val got = Similarity.simIvfPqResidualRecallCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // recall is NOT globally monotone in nprobe at a FIXED re-rank
    // pool: widening the probe set adds high-approx candidates that
    // can EVICT true positives from the bounded pool (measured here:
    // 0.70 at nprobe=7-8 dipping to 0.68 exhaustive) — the exact
    // effect the tuning curve exists to surface. The defensible
    // structural claims: the curve rises while the pool is unsaturated
    // (strictly below the peak it never falls by more than it later
    // recovers — i.e. the global max is at or after every prefix max),
    // and the first tier never beats the peak.
    val recalls = got.map(_._3)
    val peak = recalls.max
    assert(recalls.head <= peak)
    // rising prefix: up to the first tier achieving the peak, the
    // curve is monotone (eviction only bites once the pool saturates)
    val peakIdx = recalls.indexOf(peak)
    recalls.take(peakIdx + 1).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) <= w(1), s"pre-peak dip: ${got.toSeq}")
    }
    // consistency anchor: the curve's NProbe tier IS the registered
    // residual query's recall vs brute force
    val res = topkSet(Similarity.simIvfPqResidualANN(spark, sfDir))
    val wantRecall = brute.keys.toSeq.map { q =>
      res.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble /
        Similarity.TopK
    }.sum / brute.size
    val tier = got.find(_._1 == Similarity.NProbe.toLong).get
    assert(math.abs(tier._3 - wantRecall) < 1e-12,
      s"curve tier ${tier._3} != registered recall $wantRecall")
    // the equal-bits claim at the registered budget: residual >= plain
    val plain = Similarity.simIvfPqRecallCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(tier._3 >= plain(Similarity.NProbe.toLong),
      s"residual curve ${tier._3} below plain ${plain(Similarity.NProbe.toLong)}")
  }

  test("OPQ recall curve: coverage dominates bounded eviction; registered tier matches the OPQ query's own recall") {
    // the rotated tier's tuning artifact. Unlike the residual curve
    // (whose peak lands before its saturation dip, so a pre-peak-
    // monotone pin is meaningful there), THIS curve's measured shape
    // dips mid-curve and recovers to its global max at the exhaustive
    // tier (0.74 @ 6 → 0.72 @ 7-8 → 0.76 @ 10): the bounded re-rank
    // pool evicts one truth member when probes 7-8 add high-approx
    // impostors, and wider coverage later wins it back. The honest
    // structural pins: coverage dominates end-to-end (last ≥ first),
    // and every dip below the running max stays within the eviction
    // scale — single candidates, not a collapse (≤ 2 hits).
    val got = Similarity.simIvfPqOpqRecallCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    val hitsSeq = got.map(_._2)
    assert(got.last._3 >= got.head._3,
      s"coverage must dominate eviction end-to-end: ${got.toSeq}")
    var runMax = Long.MinValue
    hitsSeq.foreach { h =>
      runMax = math.max(runMax, h)
      assert(runMax - h <= 2L,
        s"dip beyond the single-candidate eviction scale: ${got.toSeq}")
    }
    // consistency anchor: the NProbe tier IS the registered OPQ
    // query's recall vs brute force
    val opq = topkSet(Similarity.simIvfPqOpqANN(spark, sfDir))
    val wantRecall = brute.keys.toSeq.map { q =>
      opq.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble /
        Similarity.TopK
    }.sum / brute.size
    val tier = got.find(_._1 == Similarity.NProbe.toLong).get
    assert(math.abs(tier._3 - wantRecall) < 1e-12,
      s"curve tier ${tier._3} != registered recall $wantRecall")
  }

  test("IVF-PQ recall curve: monotone in nprobe; exhaustive tier hits the PQ-sieve ceiling exactly") {
    val got = Similarity.simIvfPqRecallCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // recall@k is monotone in nprobe: widening the probed cell set can
    // only add pool candidates, and the exact re-rank keeps the best
    got.map(_._3).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1), s"not monotone: ${got.toSeq}")
    }
    // the exhaustive tier (nprobe = k) is exactly the flat PQ tier, so
    // its recall equals sim_pq_ann's recall vs brute force — the
    // quantization-loss ceiling, NOT 1 by construction
    val pq = topkSet(Similarity.simPqANN(spark, sfDir))
    val pqHits = brute.keys.toSeq.map { q =>
      pq.getOrElse(q, Set.empty).intersect(brute(q)).size
    }.sum
    assert(got.last._2 == pqHits.toLong,
      s"exhaustive-tier hits ${got.last._2} != PQ ceiling $pqHits")
  }

  test("LSH ANN recall >= 0.6 vs brute force") {
    val lsh = topkSet(Similarity.simLshANN(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = lsh.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    assert(recall >= 0.6, s"LSH recall $recall below bound")
  }

  test("kNN-graph ANN: recall >= 0.6; refinement monotonically improves; degree bounded") {
    import spark.implicits._
    val knn = topkSet(Similarity.simKnnGraph(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = knn.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    assert(recall >= 0.6, s"kNN-graph recall $recall below bound")
    // NN-Descent property: each round's candidates include the current
    // edges, so mean neighbor quality can only go up
    val all = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    def meanCos(rounds: Int): Double =
      Similarity.knnGraphEdges(all, Similarity.GraphK, rounds)
        .agg(avg($"cos")).head.getDouble(0)
    val seedQ = meanCos(0)
    val refinedQ = meanCos(2)
    assert(refinedQ >= seedQ - 1e-12,
      s"refinement regressed neighbor quality: seed=$seedQ refined=$refinedQ")
    // structural invariants: no self-edges, at most k neighbors per node
    val g = Similarity.knnGraphEdges(all, Similarity.GraphK, 1)
    assert(g.filter($"src" === $"dst").isEmpty)
    val degrees = g.groupBy($"src").count().agg(max($"count")).head.getLong(0)
    assert(degrees <= Similarity.GraphK)
  }

  test("on-disk kNN graph: build round-trips; append adopts a planted duplicate; compaction keeps the view") {
    import spark.implicits._
    val all = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val path = java.nio.file.Files.createTempDirectory("knn_idx").toString
    Similarity.writeKnnGraphOf(all, path, rounds = 1)
    val stored = Similarity.knnNeighbors(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Similarity.knnGraphEdges(all, Similarity.GraphK, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == direct, "top-k-on-read must reproduce the direct build")
    // plant an exact duplicate of vec 7: id 7 is ALWAYS inside the
    // id-ordered bucket cap, so the mate pair is guaranteed
    val v7 = all.filter($"vec_id" === 7L).collect().head.getSeq[Double](1)
    val batch = Seq((9007L, v7)).toDF("vec_id", "e")
    Similarity.appendKnnBatch(spark, path, batch)
    val nb = Similarity.knnNeighbors(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val newTop = nb.filter(_._1 == 9007L).minBy(_._2)
    assert(newTop._3 == 7L && newTop._4 >= 0.999999,
      s"planted duplicate must find its source: $newTop")
    val oldTop = nb.filter(_._1 == 7L).minBy(_._2)
    assert(oldTop._3 == 9007L && oldTop._4 >= 0.999999,
      s"existing node must ADOPT the planted duplicate via the reverse append: $oldTop")
    // compaction rewrites to the exact <=k rows without changing the view
    Similarity.compactKnnGraph(spark, path)
    val after = Similarity.knnNeighbors(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(after.toSet == nb.toSet, "compaction must be view-preserving")
    val maxDeg = spark.read.parquet(s"$path/edges")
      .groupBy($"src").count().agg(max($"count")).head.getLong(0)
    assert(maxDeg <= Similarity.GraphK, "compacted edges must hold the degree bound on disk")
  }

  test("graph centrality: distributed integer PageRank equals an in-memory replay exactly") {
    import spark.implicits._
    val all = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val edges = Similarity.knnGraphEdges(all, Similarity.GraphK, rounds = 1)
      .select($"src", $"dst")
    val got = Similarity.graphCentrality(edges, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay the same integer iteration single-threaded
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val outdeg = e.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val indeg = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> Similarity.RankUnit).toMap
    for (_ <- 1 to 3) {
      val contribs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      e.foreach { case (s0, d) => contribs(d) += rank(s0) / outdeg(s0) }
      rank = nodes.map(n =>
        n -> (Similarity.RankUnit * 15L / 100L + 85L * contribs(n) / 100L)).toMap
    }
    val want = nodes.map(n => (n, rank(n), indeg.getOrElse(n, 0L)))
      .sortBy { case (id, rk, _) => (-rk, id) }
    assert(got.toSeq == want.toSeq,
      s"first diff: ${got.toSeq.zip(want.toSeq).find { case (a, b) => a != b }}")
    // prototypicality sanity: unreferenced nodes sit at the 0.15 base
    val base = Similarity.RankUnit * 15L / 100L
    assert(got.filter(_._3 == 0L).forall(_._2 == base))
    assert(got.exists(_._2 > base), "somebody must be pointed at")
    // partition-independence: integer sums under a different layout
    val got2 = Similarity.graphCentrality(edges.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got2.toSeq == got.toSeq)
  }

  test("graph centrality property: random graphs (with dangling nodes) equal the replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(777)
    for (round <- 1 to 3) {
      // arbitrary directed graph: duplicate-free edges over 40 nodes,
      // some nodes source-only, some sink-only (dangling), some isolated
      // from the edge set entirely (they simply don't appear)
      val e = (0 until 120).map { _ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val edges = e.toDF("src", "dst")
      val got = Similarity.graphCentrality(edges, iters = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
      val outdeg = e.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val indeg = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var rank = nodes.map(_ -> Similarity.RankUnit).toMap
      for (_ <- 1 to 3) {
        val contribs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        e.foreach { case (s0, d) => contribs(d) += rank(s0) / outdeg(s0) }
        rank = nodes.map(n =>
          n -> (Similarity.RankUnit * 15L / 100L + 85L * contribs(n) / 100L)).toMap
      }
      val want = nodes.map(n => (n, rank(n), indeg.getOrElse(n, 0L)))
        .sortBy { case (id, rk, _) => (-rk, id) }
      assert(got.toSeq == want.toSeq, s"round $round diverged")
    }
  }

  test("fused LSH band kernel matches the Column signature form exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val all = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val viaColumn = all
      .withColumn("sig", Similarity.signature($"e"))
      .select($"vec_id", explode(array((0 until Similarity.NumBands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned($"sig", b * Similarity.BandBits)
            .bitwiseAND(lit((1 << Similarity.BandBits) - 1)).cast("int").as("bh"))
      }: _*)).as("bk"))
      .select($"vec_id", $"bk.band", $"bk.bh")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val viaKernel = Similarity.lshBandsFused(all)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaKernel == viaColumn)
    assert(viaKernel.nonEmpty)
  }

  test("IVF ANN recall >= 0.5 vs brute force with nprobe=2 of 10") {
    val ivf = topkSet(Similarity.simIvfANN(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = ivf.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    assert(recall >= 0.5, s"IVF recall $recall below bound")
  }

  test("SQ8 ANN recall >= 0.8 vs brute force; codes bounded to [-127,127]") {
    val sq = topkSet(Similarity.simSqANN(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = sq.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    assert(recall >= 0.8, s"SQ8 recall $recall below bound — int8 on 64-dim unit vectors should be near-exact")
    // code range and unit-norm preservation of the quantizer
    val v = Array.tabulate(64)(i => math.sin(i + 1.0))
    val q = Similarity.quantize(v)
    assert(q.forall(b => b >= -127 && b <= 127))
    val n = math.sqrt(Similarity.dotArr(v, v))
    q.zip(v).foreach { case (b, x) =>
      assert(math.abs(b - x / n * 127.0) <= 0.5 + 1e-9)
    }
  }

  test("PQ ANN recall vs brute force; deterministic codebook and codes") {
    val pq = topkSet(Similarity.simPqANN(spark, sfDir))
    val recall = brute.keys.toSeq.map { q =>
      val hits = pq.getOrElse(q, Set.empty).intersect(brute(q)).size
      hits.toDouble / Similarity.TopK
    }.sum / brute.size
    info(s"PQ recall@${Similarity.TopK} = $recall")
    assert(recall >= 0.4, s"PQ recall $recall below bound")
    // codebook determinism: training twice on the same sample is identical
    val sample = Array.tabulate(64)(i =>
      Array.tabulate(64)(j => math.sin(i * 64 + j + 1.0)))
    val b1 = Similarity.pqTrain(sample)
    val b2 = Similarity.pqTrain(sample)
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
    // codes are 4-bit
    val code = Similarity.pqEncode(sample(0), b1)
    assert(code.length == Similarity.PqM && code.forall(c => c >= 0 && c < Similarity.PqK))
  }

  test("IVF with all probes equals brute force exactly (rank, id, AND score)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rk", "cand_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val exhaustive = rows(Similarity.simIvfANN(spark, sfDir, nprobe = 10))
    assert(exhaustive == rows(Similarity.simBruteTopK(spark, sfDir)),
      "exhaustive IVF must reduce to brute force bit-exactly")
  }

  test("tiled all-pairs cosine is bit-identical to the broadcast kernel") {
    val a = Similarity.dedupEmbCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.dedupEmbCosineTiled(spark, sfDir, numBlocks = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("cosine is symmetric, self-cosine is 1, expression == fold bit-exact") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def d(c: String) = col(c).cast("array<double>")
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
      .select(
        Similarity.cosine(d("a"), d("b")).as("ab"),
        Similarity.cosine(d("b"), d("a")).as("ba"),
        Similarity.cosine(d("a"), d("a")).as("aa"),
        Similarity.cosineFold(d("a"), d("b")).as("fold"))
    val r = df.head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getDouble(0) == r.getDouble(3),
      "codegen'd expression must be bit-identical to the Column fold")
  }
}

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  /** Naive O(V³) triangle count + exact wedge total from the degree
    * sequence — the reference [[Similarity.triangleCensus]] must match.
    */
  private def naiveCensus(edges: Seq[(Long, Long)]): (Long, Long) = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var tri = 0L
    for {
      i <- vs.indices; j <- (i + 1) until vs.length
      if es((vs(i), vs(j)))
      k <- (j + 1) until vs.length
      if es((vs(i), vs(k))) && es((vs(j), vs(k)))
    } tri += 1
    val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map(_._2.size.toLong)
    (tri, deg.map(d => d * (d - 1) / 2).sum)
  }

  test("triangle census == naive O(V^3) reference on 40 random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val n = 2 + rnd.nextInt(9)
      val p = rnd.nextDouble()
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      val want = naiveCensus(edges)
      val got =
        if (edges.isEmpty) (0L, 0L) // empty frame: no rows to census
        else graft.ops.Similarity.triangleCensus(edges.toDF("a", "b"))
      assert(got == want,
        s"trial $trial (n=$n p=$p edges=${edges.size}): got $got want $want")
    }
  }

  test("triangle census: complete K5 and a triangle-free star") {
    val k5 = (for { a <- 0L until 5; b <- (a + 1) until 5 } yield (a, b)).toDF("a", "b")
    assert(graft.ops.Similarity.triangleCensus(k5) == (10L, 30L))
    val star = (1L to 6L).map(v => (0L, v)).toDF("a", "b")
    assert(graft.ops.Similarity.triangleCensus(star) == (0L, 15L))
  }

  test("hard negatives: labels differ, ranking is the per-anchor exact top-k") {
    val got = graft.ops.Similarity.sampleHardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getInt(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (a, _, al, n, nl, cos) =>
      assert(al != nl, s"negative $n shares anchor $a's label $al")
      assert(cos >= -1.0 - 1e-12 && cos <= 1.0 + 1e-12)
    }
    // per anchor: ranks are 1..k and cosines are non-increasing
    got.groupBy(_._1).foreach { case (a, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"anchor $a ranks not contiguous")
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._6 >= y._6; case _ => true
      }, s"anchor $a cosines not sorted")
    }
    // naive replay on the raw table: the top negative for anchor 0 is
    // the true argmax cosine over different-label vectors
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v", "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .filter(x => graft.ops.Similarity.dotArr(x._2, x._2) > 0.0)
    val a0 = raw.find(_._1 == 0L).get
    def cos(x: Array[Double], y: Array[Double]) =
      graft.ops.Similarity.dotArr(x, y) /
        (math.sqrt(graft.ops.Similarity.dotArr(x, x)) *
          math.sqrt(graft.ops.Similarity.dotArr(y, y)))
    val wantTop = raw.filter(_._3 != a0._3)
      .map(x => (x._1, cos(a0._2, x._2)))
      .sortBy { case (id, c) => (-c, id) }.head
    val gotTop = got.filter(x => x._1 == 0L && x._2 == 1L).head
    assert((gotTop._4, gotTop._6) == wantTop,
      s"anchor 0 top negative: got ${(gotTop._4, gotTop._6)} want $wantTop")
  }
}

class TripletSpec extends SparkSpec {
  import spark.implicits._

  test("triplets: distinct roles, thresholded positives, replayable negatives") {
    val rows = graft.ops.Similarity.sampleTriplets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, p, n, pc, _) =>
      assert(a != p && a != n && p != n, s"roles must be distinct: ($a,$p,$n)")
      assert(pc >= 0.40, s"positive cosine $pc below threshold")
    }
    assert(rows.map(_._1).distinct.length == rows.length,
      "one triplet per anchor")
    // negatives are hash-derived: a re-run reproduces the identical set
    val again = graft.ops.Similarity.sampleTriplets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.map(r => (r._1, r._2, r._3)).toSeq,
      "triplets must be deterministic")
    // the contrastive signal exists corpus-wide: positives are on
    // average far more similar than the hash-drawn negatives
    val meanPos = rows.map(_._4).sum / rows.length
    val meanNeg = rows.map(_._5).sum / rows.length
    assert(meanPos > meanNeg + 0.2,
      s"positives must separate from negatives ($meanPos vs $meanNeg)")
  }
}

class WinnowPairsSpec extends SparkSpec {
  import spark.implicits._

  test("winnow pairs: verbatim lift detected with high score; disjoint docs silent") {
    // doc 2 lifts doc 1's entire text into a longer document; doc 3 is
    // unrelated. The winnowing guarantee (shared substring >= k+w-1
    // chars -> >=1 shared fingerprint) plus the containment-style score
    // means the lifted pair scores high; the unrelated doc reports no
    // pair at all.
    val lifted = (1 to 40).map(i => s"liftme$i").mkString(" ")
    val docs = Seq(
      (1L, lifted),
      (2L, "own prologue words here " + lifted + " and an epilogue tail"),
      (3L, (1 to 40).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowPairsOf(docs, minShared = 5L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == Set((1L, 2L)), s"pairs: ${got.keySet}")
    val (shared, na, nb, score) = got((1L, 2L))
    assert(shared >= 5 && na <= nb)
    assert(score > 0.8, s"wholesale lift must score near 1, got $score")
    assert(score <= 1.0)
  }
}

class CompressionRatioSpec extends SparkSpec {
  import spark.implicits._

  test("compression ratio: repetitive text far below diverse; deterministic; sane bounds") {
    val repetitive = "spam ham " * 200
    val diverse = (1 to 400).map(i => s"w${i * 7919 % 99991}").mkString(" ")
    val docs = Seq((1L, repetitive), (2L, diverse)).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatioOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val (rb, rc, rr) = got(1L)
    val (db, dc, dr) = got(2L)
    assert(rb == repetitive.length && db == diverse.length)
    assert(rc > 0 && dc > 0)
    assert(rr < 0.05, s"repetitive text must compress hard, ratio $rr")
    assert(dr > 3 * rr, s"diverse ($dr) must compress far worse than repetitive ($rr)")
    assert(rr > 0.0 && dr < 1.5) // deflate overhead can exceed 1 slightly
    // deterministic across runs and partitionings
    val again = TextAnalysis.compressionRatioOf(docs.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.view.mapValues(_._2).toMap)
    // corpus smoke: every doc measured
    assert(TextAnalysis.taCompressionRatio(spark, sfDir).count() == 500)
  }

  test("portable compressibility twin: hand-computed estimate; discriminates like deflate") {
    val l = TextAnalysis.CompressGramL
    // "abcdefgh" * 5 (40 chars): 33 grams, distinct = the 8 rotations
    // of the period → est = 8*8 + 25*2 = 114
    val repetitive = "abcdefgh" * 5
    val diverse = (1 to 5).map(i => s"w${i * 7919 % 99991}!").mkString(" ")
      .padTo(40, '.').take(40) // 40 chars, essentially all-distinct grams
    val short = "tiny" // < L: codes raw, est_bytes = n_chars
    val docs = Seq((1L, repetitive), (2L, diverse), (3L, short), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionPortableOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) -1.0 else r.getDouble(5)))).toMap
    assert(got(1L) == ((40L, 33L, 8L, 8L * l + 25L * 2L,
      (8.0 * l + 50.0) / 40.0)))
    val (dn, dg, dd, de, dr) = got(2L)
    assert(dn == 40L && dg == 33L && dd > 25L, s"diverse distinct: $dd")
    assert(de > got(1L)._4 && dr > got(1L)._5,
      "diverse must estimate larger than repetitive — the deflate ordering")
    assert(got(3L) == ((4L, 0L, 0L, 4L, 1.0)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, -1.0)), "empty doc: NULL ratio")
    // and the twin orders the SAME planted pair the zlib query orders
    val z = TextAnalysis.compressionRatioOf(docs.filter($"doc_id" <= 2))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert((z(1L) < z(2L)) == (got(1L)._5 < got(2L)._5),
      "portable twin must agree with deflate on the planted ordering")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSampledTA[T](gen: org.scalacheck.Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).foreach(body)
    }

  /** The LM scorer's contract replayed naively — add-one bigram model
    * over the corpus, per-occurrence surprisal = floor-log2 of the
    * integer reciprocal-probability — with none of the distributed
    * plan's structure (no zip_with, no joins, no conv-string log2).
    */
  private def lmRef(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val v = uni.size.toLong
    val bigrams = toks.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map(p => (id, p)) }
    val bcnt = bigrams.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    bigrams.groupBy(_._1).map { case (id, bs) =>
      val bits = bs.map { case (_, p @ (prev, _)) =>
        63L - java.lang.Long.numberOfLeadingZeros((uni(prev) + v) / (bcnt(p) + 1L))
      }
      id -> ((bs.size.toLong, bits.sum, bits.sum.toDouble / bs.size.toDouble))
    }
  }

  test("ScalaCheck: LM surprisal equals the naive reference on random corpora") {
    import org.scalacheck.Gen
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val genDoc = for {
      n <- Gen.choose(0, 12) // includes <2-token docs (no bigrams)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val genCorpus = for {
      nd <- Gen.choose(2, 8)
      ds <- Gen.listOfN(nd, genDoc)
      dup <- Gen.oneOf(true, false) // duplicated docs stress the counts
    } yield (ds ++ (if (dup) ds.take(2) else Nil)).zipWithIndex
      .map { case (t, i) => ((i + 1).toLong, t) }
    forAllSampledTA(genCorpus, n = 8) { docs =>
      val got = TextAnalysis.lmSurprisalOf(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got == lmRef(docs), s"kernel diverged on $docs:\n got=$got\nwant=${lmRef(docs)}")
    }
  }

  test("LM surprisal: integer bits match an in-JVM bigram model; templated scores below garbled") {
    // planted corpus: a templated doc (one repeated transition), a
    // garbled doc (all transitions unique), and a short doc — the
    // model trains on all three (add-one bigram, V = distinct tokens)
    val docs = Seq(
      (1L, "a b a b a b a b a b"),
      (2L, "q w e r t y u i o p"),
      (3L, "a b"))
    val work = java.nio.file.Files.createTempDirectory("graft-lm").toString
    docs.toDF("doc_id", "text").write.parquet(s"$work/documents.parquet")
    // brute-force reference, straight from the definition
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val v = uni.size.toLong
    val bigrams = toks.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map(p => (id, p)) }
    val bcnt = bigrams.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val bits = bs.map { case (_, p @ (prev, _)) =>
        val den = uni(prev) + v
        val num = bcnt(p) + 1L
        63L - java.lang.Long.numberOfLeadingZeros(den / num)
      }
      id -> ((bs.size.toLong, bits.sum,
        bits.sum.toDouble / bs.size.toDouble))
    }
    val got = TextAnalysis.taLmSurprisal(spark, work).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, s"got $got want $want")
    assert(got(1L)._3 < got(2L)._3,
      "templated transitions must score below garbled ones")
    // the histogram is the exact rollup of the per-doc table
    val hist = TextAnalysis.taLmQualityHist(spark, work).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantHist = want.values.groupBy(t => math.floor(t._3).toLong)
      .map { case (b, xs) => (b, xs.size.toLong, xs.map(_._1).sum) }
      .toSeq.sorted
    assert(hist.toSeq.sorted == wantHist)
  }

  test("LM backoff rate by source reconciles the per-doc trigram table exactly") {
    val perdoc = TextAnalysis.taLmTrigram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val srcOf = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = perdoc.groupBy { case (id, _) => srcOf(id) }
      .map { case (s, xs) =>
        val n = xs.size.toLong
        val nt = xs.values.map(_._1).sum
        val nb = xs.values.map(_._2).sum
        val tb = xs.values.map(_._3).sum
        s -> ((n, nt, nb, nb.toDouble / nt.toDouble, tb.toDouble / nt.toDouble))
      }
    val got = TextAnalysis.taLmBackoffRate(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == want, s"got $got want $want")
    // docs with < 3 tokens never reach the trigram table; every source
    // that does appear must be fully accounted
    assert(got.values.map(_._1).sum == perdoc.size.toLong)
  }

  test("LM trigram backoff: bits match an in-JVM Katz-style model; " +
      "templated < garbled; singletons back off") {
    // templated doc (every trigram repeats → the reliable trunk fires),
    // garbled doc (every trigram is a singleton → every occurrence
    // backs off), and a 3-token doc with exactly one trigram
    val docs = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "q w e r t y u i o p z x"),
      (3L, "a b a"))
    val work = java.nio.file.Files.createTempDirectory("graft-lm3").toString
    docs.toDF("doc_id", "text").write.parquet(s"$work/documents.parquet")
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val v = uni.size.toLong
    val bcnt = toks.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val tris = toks.flatMap { case (id, ws) =>
      ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq
        .map { case (a, b, c) => (id, (a, b, c)) } }
    val tcnt = tris.groupBy(_._2).map { case (t3, xs) => t3 -> xs.size.toLong }
    def bitlen(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val want = tris.groupBy(_._1).map { case (id, ts) =>
      val scored = ts.map { case (_, t3 @ (a, b, c)) =>
        if (tcnt(t3) >= 2L)
          (bitlen((bcnt((a, b)) + v) / (tcnt(t3) + 1L)), 0L)
        else // singleton: 1-bit penalty + the (b,c) bigram estimate
          (1L + bitlen((uni(b) + v) / (bcnt((b, c)) + 1L)), 1L)
      }
      id -> ((ts.size.toLong, scored.map(_._2).sum, scored.map(_._1).sum,
        scored.map(_._1).sum.toDouble / ts.size.toDouble))
    }
    val got = TextAnalysis.taLmTrigram(spark, work).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want, s"got $got want $want")
    assert(got(1L)._4 < got(2L)._4,
      "templated trigrams must score below garbled ones")
    assert(got(1L)._2 == 0L, "repeated trigrams must never back off")
    assert(got(2L)._2 == got(2L)._1,
      "all-singleton trigrams must always back off")
  }

  test("KN 4-gram: bits match an in-JVM continuation-count model; " +
      "all four ladder levels fire; templated < garbled") {
    // fixture exercises every backoff level: doc 1 templated (repeated
    // 4-grams → level 0, zero backoff), docs 3/4 share a (p1,p2,p3)
    // tail under two distinct predecessors (singleton 4-grams, cont3=2
    // → level 1), docs 5/6 share only the (s1,s2) continuation under
    // two distinct b's (cont3=1, cont2=2 → level 2), doc 2 all-unique
    // (every count chain bottoms out → level 3, full backoff)
    val docs = Seq(
      (1L, "a b a b a b a b a b a b"),
      (2L, "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10 g11 g12"),
      (3L, "u1 p1 p2 p3"),
      (4L, "u2 p1 p2 p3"),
      (5L, "w1 m1 s1 s2"),
      (6L, "w2 m2 s1 s2"))
    val work = java.nio.file.Files.createTempDirectory("graft-kn4").toString
    docs.toDF("doc_id", "text").write.parquet(s"$work/documents.parquet")
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val v = toks.flatMap(_._2).distinct.size.toLong
    val quads = toks.flatMap { case (id, ws) =>
      ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).lazyZip(ws.drop(3)).toSeq
        .map { case (a, b, c, d) => (id, (a, b, c, d)) } }
    val qcnt = quads.groupBy(_._2).map { case (q, xs) => q -> xs.size.toLong }
    // the continuation-count recursion, each level a distinct-type
    // aggregate of the one above (Chen & Goodman's N1+ chain)
    val ctx4 = qcnt.groupBy { case ((a, b, c, _), _) => (a, b, c) }
      .map { case (k, m) => k -> m.values.sum }
    val cont3 = qcnt.keys.toSeq.groupBy { case (_, b, c, d) => (b, c, d) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val ctx3 = qcnt.keys.toSeq.groupBy { case (_, b, c, _) => (b, c) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val cont2 = cont3.keys.toSeq.groupBy { case (_, c, d) => (c, d) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val ctx2 = cont3.keys.toSeq.groupBy { case (_, c, _) => c }
      .map { case (k, xs) => k -> xs.size.toLong }
    val cont1 = cont2.keys.toSeq.groupBy { case (_, d) => d }
      .map { case (k, xs) => k -> xs.size.toLong }
    val ctx1 = cont2.size.toLong
    def bitlen(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    def score(q: (String, String, String, String)): (Long, Long) = {
      val (a, b, c, d) = q
      if (qcnt(q) >= 2L)
        (bitlen((ctx4((a, b, c)) + v) / (qcnt(q) + 1L)), 0L)
      else if (cont3((b, c, d)) >= 2L)
        (1L + bitlen((ctx3((b, c)) + v) / (cont3((b, c, d)) + 1L)), 1L)
      else if (cont2((c, d)) >= 2L)
        (2L + bitlen((ctx2(c) + v) / (cont2((c, d)) + 1L)), 2L)
      else
        (3L + bitlen((ctx1 + v) / (cont1(d) + 1L)), 3L)
    }
    val want = quads.groupBy(_._1).map { case (id, qs) =>
      val scored = qs.map(q => score(q._2))
      id -> ((qs.size.toLong, scored.count(_._2 >= 1L).toLong,
        scored.map(_._1).sum,
        scored.map(_._1).sum.toDouble / qs.size.toDouble))
    }
    val got = TextAnalysis.taLmKn4(spark, work).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want, s"got $got want $want")
    assert(got(1L)._2 == 0L, "repeated 4-grams must never back off")
    assert(got(2L)._2 == got(2L)._1, "all-unique 4-grams must always back off")
    assert(got(1L)._4 < got(2L)._4,
      "templated 4-grams must score below garbled ones")
    // the levels census: every ladder level fires, exactly as the
    // reference predicts (types AND occurrence mass)
    val wantLevels = quads.map { case (_, q) => (score(q)._2, q) }
      .groupBy(_._1).map { case (lvl, xs) =>
        lvl -> ((xs.map(_._2).distinct.size.toLong, xs.size.toLong))
      }
    val gotLevels = TextAnalysis.taLmKn4Levels(spark, work).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotLevels == wantLevels, s"got $gotLevels want $wantLevels")
    assert(gotLevels.keySet == Set(0L, 1L, 2L, 3L),
      "fixture must exercise all four ladder levels")
  }

  /** Classic single-machine BPE (Sennrich et al.) over a word-freq map
    * — the ground truth the distributed trainer must reproduce merge
    * for merge, same tie-break.
    */
  private def bpeRef(
      wordFreq: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var words = wordFreq.map { case (w, f) => w.map(_.toString).toVector -> f }.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    while (out.length < n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), cnt) => (-cnt, x, y) }.head
        out += ((a, b, c))
        words = words.map { case (syms, f) =>
          val fused = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              fused += (a + b); i += 2
            } else { fused += syms(i); i += 1 }
          }
          fused.toVector -> f
        }
      }
    }
    out.toSeq
  }

  test("BPE trainer: distributed merges equal the classic reference; encoding compresses") {
    // the canonical BPE corpus: shared prefixes force multi-char merges
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"),
      (3L, "low newest widest lower")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeTrainOf(docs, 12).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val wf = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val want = bpeRef(wf, 12)
    assert(got == want,
      s"distributed merge sequence diverged:\n got=$got\nwant=$want")
    assert(got.nonEmpty && got.exists(_._1.length > 1),
      "later merges must fuse multi-char symbols")
    // partition independence: same merges from a different layout
    val got2 = graft.ops.TextAnalysis.bpeTrainOf(docs.repartition(7), 12)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got2 == got, "merge sequence must not depend on partitioning")
    // the apply half: encoding under the merges shortens every word the
    // trainer saw, and 'lowest' (unseen) still benefits from shared stems
    val merges = got.map(p => (p._1, p._2))
    assert(graft.ops.TextAnalysis.bpeEncode("newest", merges).length <
      "newest".length)
    assert(graft.ops.TextAnalysis.bpeEncode("lowest", merges).length <
      "lowest".length, "learned subwords must generalize to unseen words")
    // real corpus smoke: full round count, deterministic row shape
    val real = graft.ops.TextAnalysis.taBpeTrain(spark, sfDir, 8).collect()
    assert(real.length == 8 && real.map(_.getLong(0)).toSeq == (1L to 8L))
  }

  test("BPE encode: kernel equals direct re-encode; frozen merges round-trip") {
    import graft.ops.TextAnalysis._
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"),
      (3L, "low newest widest lower"),
      (4L, "   "),
      (5L, "Mixed CASE lowest")).toDF("doc_id", "text")
    val mergesDf = bpeTrainOf(docs, 12)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = bpeEncodeDocs(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    // ground truth: encode every word directly with the public helper
    val want = docs.as[(Long, String)].collect().sortBy(_._1).map { case (id, text) =>
      val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      val syms = words.flatMap(w => bpeEncode(w, merges))
      val top =
        if (syms.isEmpty) ("", 0L)
        else syms.groupBy(identity).map { case (sy, xs) => (sy, xs.length.toLong) }
          .toSeq.minBy { case (sy, c) => (-c, sy) }
      (id, words.length.toLong, syms.length.toLong, top._1, top._2)
    }
    assert(got.toSeq == want.toSeq, s"\n got=${got.toSeq}\nwant=${want.toSeq}")
    // cache-independence: a different partitioning (different memo fill
    // order) must not change a single row
    val got2 = bpeEncodeDocs(docs.repartition(5), merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got2.toSeq == got.toSeq)
    // freeze half: written merges read back identical, encode identical
    val dir = java.nio.file.Files.createTempDirectory("bpe_frozen").toString
    writeBpeMerges(mergesDf, s"$dir/merges")
    val frozen = readBpeMerges(spark, s"$dir/merges")
    assert(frozen == merges, "frozen merge table must round-trip in rank order")
    // registered form on the real corpus: every doc present, symbol
    // count bounded by character count (merges only ever shorten)
    val real = taBpeEncode(spark, sfDir, 6).collect()
    val nDocs = graft.Tables.t(spark, sfDir, "documents").count()
    assert(real.length == nDocs)
    assert(real.forall(r => r.getLong(2) >= r.getLong(1)),
      "a word is at least one symbol")
  }

  test("lang confusion: conserves docs; matrix equals a langid join replay") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.taLangConfusion(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
    assert(got.values.sum == docs.count(), "every doc in one matrix cell")
    // independent replay: join the registered langid output to lang
    val want = TextAnalysis.taLangId(spark, sfDir)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("lang_pred")).count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == want)
  }

  test("fertility report: conserves docs; per-source ratios replay from the encode") {
    import graft.ops.TextAnalysis._
    import org.apache.spark.sql.functions._
    val got = taFertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val docs = graft.Tables.t(spark, sfDir, "documents")
    assert(got.map(_._2).sum == docs.count(), "every doc in one source row")
    got.foreach { case (src, _, nChars, nWords, nSyms, cps, spw) =>
      assert(nSyms >= nWords, s"$src: a word is at least one symbol")
      assert(nChars >= nSyms, s"$src: merges only shorten, chars >= syms")
      assert(cps == nChars.toDouble / nSyms.toDouble)
      assert(spw == nSyms.toDouble / nWords.toDouble)
      assert(spw >= 1.0 && cps >= 1.0)
    }
  }

  test("BPE encode property: kernel equals helper re-encode on generated corpora") {
    import graft.ops.TextAnalysis._
    val rnd = new scala.util.Random(31337)
    val alphabet = "abcd"
    def word(): String =
      (0 until 1 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 3) {
      // small alphabet → dense pair statistics → deep merge chains
      val docs = (1L to 20L).map(i =>
        (i, (0 until 1 + rnd.nextInt(30)).map(_ => word()).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      val merges = bpeTrainOf(df, 10).orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val got = bpeEncodeDocs(df.repartition(1 + rnd.nextInt(7)), merges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      val want = docs.map { case (id, text) =>
        val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
        val syms = words.flatMap(w => bpeEncode(w, merges))
        val top =
          if (syms.isEmpty) ("", 0L)
          else syms.groupBy(identity).map { case (sy, xs) => (sy, xs.length.toLong) }
            .toSeq.minBy { case (sy, c) => (-c, sy) }
        (id, words.length.toLong, syms.length.toLong, top._1, top._2)
      }
      assert(got.toSeq == want.toSeq, s"round $round diverged")
      // encoding is lossless: symbols of each word concatenate back
      docs.flatMap(_._2.split(" ")).filter(_.nonEmpty).take(50).foreach { w =>
        assert(bpeEncode(w, merges).mkString == w, s"'$w' did not reassemble")
      }
    }
  }

  test("BPE curve: one-pass budget snapshots equal per-budget re-encodes; monotone") {
    import graft.ops.TextAnalysis._
    val docs = Seq(
      (1L, "low lower lowest newer newest new low low lower"),
      (2L, "widest wider wide new newest lowest low"),
      (3L, "er er er est est newer wider lower")).toDF("doc_id", "text")
    val merges = bpeTrainOf(docs, 10).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val budgets = Seq(0, 2, 5, 10, 15) // 15 > trained count: full chain
    val got = bpeCurveOf(docs.repartition(4), merges, budgets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // reference: independent re-encode under each PREFIX of the table
    val words = docs.collect().flatMap(
      _.getString(1).toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    val want = budgets.map { b =>
      val syms = words.map(w => bpeEncode(w, merges.take(b)).length.toLong).sum
      (b.toLong, words.length.toLong, syms,
        syms.toDouble / words.length.toDouble)
    }
    assert(got.toSeq == want, "curve must equal per-budget re-encodes")
    // budget 0 codes raw characters; symbol mass never grows with budget
    assert(got.head._3 == words.map(_.length.toLong).sum)
    got.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 <= lo._3, s"n_syms must be non-increasing: $lo -> $hi")
    }
  }

  test("BPE encode cache: hit is bit-identical; corpus rewrite in place retrains") {
    import graft.ops.TextAnalysis._
    val dir = java.nio.file.Files.createTempDirectory("bpe_cache").toString
    def writeCorpus(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    def direct(n: Int): Seq[(Long, Long, Long, String, Long)] = {
      val docs = graft.Tables.t(spark, dir, "documents")
      val merges = bpeTrainOf(docs, n).orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      bpeEncodeDocs(docs, merges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toSeq
    }
    def cached(n: Int): Seq[(Long, Long, Long, String, Long)] =
      taBpeEncode(spark, dir, n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toSeq
    writeCorpus(Seq((1L, "low low low lower newest"), (2L, "newest newest widest")))
    val first = cached(8)
    assert(first == direct(8), "cold path must equal a direct train+encode")
    assert(cached(8) == first, "cache hit must be bit-identical")
    // REWRITE the corpus at the same path: different pair statistics →
    // the fingerprint changes → a stale merge table must NOT be reused
    writeCorpus(Seq((1L, "zig zig zigzag zag"), (2L, "zagzag zig zag zag")))
    val second = cached(8)
    assert(second == direct(8),
      "rewritten corpus must retrain, not reuse the stale cached merges")
    assert(second != first)
  }

  test("bm25 multi: each query's block equals the single-query form") {
    val qs = graft.ops.TextAnalysis.Bm25MultiQueries
    val k = graft.ops.TextAnalysis.Bm25PerQueryK
    val multi = graft.ops.TextAnalysis.taBm25Multi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(multi.keySet == qs.map(_._1).toSet)
    qs.foreach { case (qid, q) =>
      val single = graft.ops.TextAnalysis
        .bm25Of(graft.Tables.t(spark, sfDir, "documents"), q, k)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val block = multi(qid).sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(block == single,
        s"$qid: multi block must equal the single-query top-$k")
      assert(multi(qid).map(_._2).sorted.toSeq == (1L to k).toSeq,
        s"$qid: ranks must be contiguous 1..$k")
    }
  }

  test("bm25: rare-term docs outrank common-term docs; tf saturates; top-n is a heap, not a sort") {
    // 10 filler docs give the common term high df and the rare term df=1
    val filler = (10L to 19L).map(i => (i, "common words everywhere common"))
    val docs = (Seq(
      (1L, "needle common words here"),       // the only rare-term doc
      (2L, "common common common common"),    // tf-stuffed common term
      (3L, "words words unrelated stuff")) ++ filler)
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bm25Of(docs, "needle common", 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == 5)
    assert(got.head._1 == 1L,
      "the df=1 term dominates: its one holder must rank first")
    val scores = got.map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "descending scores")
    // tf saturation: doc 2 has 4x the common-term tf of each filler doc
    // but the same length; its advantage must be well under 4x
    val byId = graft.ops.TextAnalysis.bm25Of(docs, "common", 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(2L) > byId(10L), "higher tf still scores higher")
    assert(byId(2L) < 2.5 * byId(10L),
      s"k1 must saturate tf (got ${byId(2L)} vs ${byId(10L)})")
    // scale shape: LIMIT compiles to TakeOrderedAndProject
    val plan = graft.ops.TextAnalysis.bm25Of(docs, "needle", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-n should be a bounded heap, not a global sort:\n$plan")
  }

  test("char diversity: simpson index separates padding from natural text") {
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "aabb"), (4L, ""))
      .toDF("doc_id", "text")
    val res = graft.ops.TextAnalysis.charDiversityOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(res(1L) == ((4L, 1L, 16L, 1.0)))  // pure padding collides always
    assert(res(2L) == ((4L, 4L, 4L, 0.25)))  // all-distinct: 1/n
    assert(res(3L) == ((4L, 2L, 8L, 0.5)))
    assert(!res.contains(4L), "empty text drops out, matching the oracle")
    // and the full op on real data: simpson in (0,1], padding-free corpus sits low
    val real = graft.ops.TextAnalysis.taCharDiversity(spark, sfDir)
      .collect().map(_.getDouble(4))
    assert(real.nonEmpty && real.forall(s => s > 0.0 && s <= 1.0))
    assert(real.count(_ < 0.2).toDouble / real.length > 0.9,
      "natural text has low collision probability")
  }

  test("token count ignores extra whitespace; empty text is zero") {
    val df = Seq((1L, "  a   b\tc "), (2L, ""), (3L, "word"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("PII redaction masks emails, urls, ips, phones; clean text unchanged") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.co now"),
      (2L, "see https://a.example.org/p?q=1 and http://b.io"),
      (3L, "host 10.0.255.7 dialed 555-123-4567"),
      (4L, "no pii here at all"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.redactPii($"text").as("r"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "mail <EMAIL> now")
    assert(m(2L) == "see <URL> and <URL>")
    assert(m(3L) == "host <IP> dialed <PHONE>")
    assert(m(4L) == "no pii here at all")
  }

  test("repetition metrics: ratios are exact divisions; dup sentences counted") {
    val df = Seq(
      (1L, "a a a b. x y. x y"), // tokens: a a a b. x y. x y -> 8; sents: "a a a b","x y","x y"
      (2L, ""))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionOf(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getLong(1) == 8L) // n_tokens
    assert(r1.getLong(5) == 3L) // n_sents
    assert(r1.getDouble(6) == 1.0 / 3.0) // one duplicated sentence of three
    assert(r1.getDouble(4) == 3.0 / 8.0) // max token 'a' appears 3 of 8
    val r2 = m(2L)
    assert(r2.getLong(1) == 0L && r2.getDouble(3) == 0.0)
  }

  test("language id picks the dominant profile; ties resolve to first") {
    val df = Seq(
      (1L, "the cat is on the mat and the dog is in the house"),
      (2L, "el gato y la casa de los perros que viven en una calle"),
      (3L, "zzz qqq www")) // no profile hits
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.langId($"text").as("lang"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("winnowing: substring matches of length >= k+w-1 share a fingerprint") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    val withSharedSubstring = "PREFIX " + base + " SUFFIX"
    val unrelated = "0123456789abcdefghij0123456789abcdefghij no overlap at all here"
    val a = TextAnalysis.winnow(base).toSet
    val b = TextAnalysis.winnow(withSharedSubstring).toSet
    val c = TextAnalysis.winnow(unrelated).toSet
    assert(a.nonEmpty && a.intersect(b).nonEmpty,
      "documents sharing a long substring must share fingerprints")
    assert(a.intersect(c).isEmpty, "unrelated documents should not collide")
    assert(TextAnalysis.winnow(base).toSeq == TextAnalysis.winnow(base).toSeq,
      "deterministic")
    assert(TextAnalysis.winnow("short").isEmpty, "below k yields no fingerprints")
  }

  test("winnow rolling hash equals the direct polynomial mod 2^64 (the r14 replay-oracle identity)") {
    // The DuckDB ta_winnow oracle replays each k-gram hash as the
    // DIRECT polynomial sum c_j·B^(k-1-j) mod 2^64, while the kernel
    // computes it by the rolling recurrence through a WRAPPED
    // precomputed B^(k-1). The two are equal by ring identities; this
    // pins the claim on the JVM side with an independent BigInt
    // reference (including texts long enough that every intermediate
    // wraps many times, and the n<=w single-min and len<k empty paths).
    val U64 = BigInt(1) << 64
    val B = BigInt(1000003)
    def reference(text: String, k: Int = 8, w: Int = 4): Seq[Long] = {
      val s = text.toLowerCase.replaceAll("\\s+", " ").trim
      if (s.length < k) return Seq.empty
      val hs = (0 to s.length - k).map { i =>
        val u = (0 until k).foldLeft(BigInt(0)) { (acc, j) =>
          (acc * B + s.charAt(i + j).toInt).mod(U64)
        }
        (if (u >= (BigInt(1) << 63)) u - U64 else u).toLong
      }
      if (hs.length <= w) Seq(hs.min)
      else (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct.sorted
    }
    val rnd = new scala.util.Random(42)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog while the cat sleeps",
      "exactly8", "nine char", "tiny", "",
      (1 to 500).map(_ => rnd.nextPrintableChar()).mkString,
      "~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~") // high char codes, heavy wrap
    texts.foreach { t =>
      assert(TextAnalysis.winnow(t).toSeq == reference(t),
        s"rolling != polynomial for ${t.take(20)}")
    }
  }

  test("winnow replay oracle is emitted iff the corpus is replay-safe (r13 VERDICT ask #2)") {
    val saved = graft.ops.Similarity.oracleContext
    try {
      graft.ops.Similarity.oracleContext = None
      assert(!TextAnalysis.oracles.contains("ta_winnow"))
      graft.ops.Similarity.oracleContext = Some((spark, sfDir))
      val o = TextAnalysis.oracles
      assert(o.contains("ta_winnow"),
        "ASCII corpus must carry the mod-2^64 winnow replay oracle")
      assert(o("ta_winnow").contains("unicode(") &&
        o("ta_winnow").contains("bit_xor"),
        "the oracle must re-derive hashes from raw characters")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-winnowunsafe").toString
      Seq((1L, "has a vertical\u000Btab")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.ops.Similarity.oracleContext = Some((spark, dir))
      assert(!TextAnalysis.oracles.contains("ta_winnow"),
        "an engine-divergent corpus must fall back to rows-only")
    } finally graft.ops.Similarity.oracleContext = saved
  }

  test("portable winnowing keeps the substring-sharing guarantee") {
    val md = new TextAnalysis.Md5Memo()
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps"
    val a = TextAnalysis.winnowPortable(base, md).toSet
    val b = TextAnalysis.winnowPortable("PREFIX " + base + " SUFFIX", md).toSet
    val c = TextAnalysis.winnowPortable(
      "0123456789abcdefghij0123456789abcdefghij no overlap at all here", md).toSet
    assert(a.nonEmpty && a.intersect(b).nonEmpty)
    assert(a.intersect(c).isEmpty)
    assert(TextAnalysis.winnowPortable("short", md).isEmpty)
    assert(a.forall(_.matches("[0-9a-f]{32}")), "md5 hex fingerprints")
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("novelty: verbatim copies score 0, disjoint docs score 1, overlap is the shared fraction") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, base),                                   // first occurrence of everything
      (2L, base),                                   // full copy -> novelty 0
      (3L, "kilo lima mike november oscar papa"),   // disjoint -> novelty 1
      (4L, base + " india juliet"),                 // suffix extension: only the crossing+new trigrams are novel
      (5L, "xx"))                                   // < 3 words -> absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(5L))
    assert(got(1L)._3 == 1.0, s"first doc owns all its shingles: ${got(1L)}")
    assert(got(2L)._2 == 0L && got(2L)._3 == 0.0, s"copy must be 0-novel: ${got(2L)}")
    assert(got(3L)._3 == 1.0)
    // doc 4: base has 6 trigrams (8 words), doc 4 has 8 (10 words) — the
    // 2 involving the appended words are novel
    assert(got(4L)._1 == 8L && got(4L)._2 == 2L, s"${got(4L)}")
    // conservation: n_novel across the corpus == number of distinct shingles
    val distinctShingles = Dedup.shingledOf(docs).select("sh").distinct().count()
    assert(got.values.map(_._2).sum == distinctShingles)
  }

  test("matryoshka: full-dim recall anchors at 1; every dim ranks queries*k pairs") {
    val rows = Similarity.simMatryoshka(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    assert(rows.map(_._1).toSeq == Similarity.MatryoshkaDims.map(_.toLong))
    val expectPairs = Similarity.NumQueries.toLong * Similarity.TopK
    rows.foreach { case (d, (np, nm, rec)) =>
      assert(np == expectPairs, s"dims=$d pairs=$np")
      assert(nm >= 0 && nm <= np && rec >= 0.0 && rec <= 1.0)
    }
    val full = rows.toMap.apply(Similarity.MatryoshkaDims.last.toLong)
    assert(full._2 == expectPairs && full._3 == 1.0,
      "full-dimension search must equal its own truth")
  }

  test("ivf balance: cells conserve the corpus; shares sum to 1; hot flag consistent") {
    import org.apache.spark.sql.functions._
    val got = Similarity.simIvfBalance(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val n = graft.Tables.t(spark, sfDir, "embeddings").count()
    val k = got.length.toLong
    assert(got.map(_._2).sum == n)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-9)
    got.foreach { case (c, nv, _, hot) =>
      assert(hot == (nv * k > 2 * n), s"cell $c hot flag") }
  }

  test("knn probe: per-label query counts conserve the probe set; accuracy in [0,1]") {
    val got = Similarity.simKnnProbe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._2).sum == Similarity.ProbeQueries)
    got.foreach { case (_, nq, nc, acc) =>
      assert(nc <= nq && acc >= 0.0 && acc <= 1.0) }
  }

  test("ivf rebalance: actions partition the cells; merge targets are non-merge cells") {
    val bal = Similarity.simIvfBalance(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Similarity.simIvfRebalance(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
    // same cells, same counts as the balance report
    assert(got.map(x => x._1 -> x._2).toMap == bal)
    val n = got.map(_._2).sum
    val k = got.length.toLong
    val nonMerge = got.filter(_._3 != "merge").map(_._1).toSet
    got.foreach { case (c, nv, action, tgt) =>
      // thresholds replay exactly (5nk vs 6N split, 10nk vs 9N merge)
      val want = if (nv * k * 5 > n * 6) "split"
        else if (nv * k * 10 < n * 9) "merge" else "keep"
      assert(action == want, s"cell $c action")
      // a merge cell folds into a surviving cell; others have no target
      assert(tgt.isDefined == (action == "merge"), s"cell $c target presence")
      tgt.foreach(t => assert(nonMerge.contains(t) && t != c, s"cell $c target"))
    }
  }

  test("zipf dyadic: hand-computed regression on a planted frequency table") {
    import graft.ops.{TextAnalysis => TA}
    // corpus: 'a'×8, 'b'×4, 'c'×2, 'd'×1 → ranks 1..4
    // points (x=⌊lb r⌋, y=⌊lb f⌋): (0,3) (1,2) (1,1) (2,0)
    // n=4 Sx=4 Sy=6 Sxy=0+2+1+0=3 Sxx=0+1+1+4=6
    // slope=(12-24)/(24-16)=-1.5; intercept=(6-(-1.5*4))/4=3.0
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c c d").trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TA.taZipfDyadic(spark, dir).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.5)
    assert(r.getDouble(2) == 3.0)
  }

  test("asciiReplaySafe: accepts the ASCII corpus, rejects every engine-divergent character class (r12 ADVICE #1)") {
    import spark.implicits._
    assert(graft.ops.TextAnalysis.asciiReplaySafe(spark, sfDir),
      "the testdata corpus is printable-ASCII and must pass")
    // each fixture is a character where Java-side and DuckDB-side text
    // primitives provably diverge; any one of them must veto the
    // data-derived replay oracles (fall back to rows-only)
    val divergent = Seq(
      "vt is java-regex-only whitespace \u000B split diverges",
      "dotted capital I \u0130 lower() diverges",
      "bpe separator \u001F collides",
      "non-bmp \uD83D\uDE00 charAt diverges",
      "nbsp \u00A0 is non-ascii")
    divergent.zipWithIndex.foreach { case (txt, i) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-replaysafe$i").toString
      Seq((1L, "plain ascii doc"), (2L, txt)).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      assert(!graft.ops.TextAnalysis.asciiReplaySafe(spark, dir),
        s"corpus with ${txt.take(20)}... must fall back to rows-only")
    }
    // NULL text: the replay kernels and the guard must agree it is unsafe
    val dir = java.nio.file.Files
      .createTempDirectory("graft-replaysafenull").toString
    Seq((1L, "plain"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(!graft.ops.TextAnalysis.asciiReplaySafe(spark, dir),
      "a NULL text must veto the replay oracles")
  }
}

class SubstrSpansSpec extends SparkSpec {
  import spark.implicits._

  test("char-level dup spans: overlapping grams merge to maximal spans; short docs skip") {
    // L=5: docs 1 and 2 share the 9-char run 'ABCDEFGHI' (5 dup grams
    // at p=1..5 in doc 1 → ONE merged span of 9 chars); doc 3 is
    // shorter than L and must report zero with no gram rows; doc 4
    // repeats a 5-char block WITHIN itself at a distance, giving two
    // disjoint single-gram spans (occurrences ≥ 2 counts within-doc)
    val docs = Seq(
      (1L, "ABCDEFGHIxxxx"), // shared run at p=1..5 → span [1,10) = 9
      (2L, "zzABCDEFGHI"),   // same run at p=3..7 → span [3,12) = 9
      (3L, "abc"),           // < L: no grams
      // self-repeat separated by an all-distinct filler (a repeated
      // filler char would gram-match itself and weld one giant span)
      (4L, "QRSTUabcdefQRSTU") // spans [1,6) and [12,17)
    ).toDF("doc_id", "text")
    val got = Curation.substrSpansOf(docs, l = 5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((13L, 1L, 9L)))
    assert(got(2L) == ((11L, 1L, 9L)))
    assert(got(3L) == ((3L, 0L, 0L)))
    assert(got(4L) == ((16L, 2L, 10L)))
  }

  test("adjacent marks coalesce: a duplicated run one char apart stays one span") {
    // docs share 'ABCDEF' (6 chars, L=5 → grams at p=1,2 in doc 1;
    // p <= prev_end always, single span of 6)
    val docs = Seq((1L, "ABCDEFxx"), (2L, "yyABCDEF")).toDF("doc_id", "text")
    val got = Curation.substrSpansOf(docs, l = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 1L, 6L), (2L, 1L, 6L)))
  }

  test("random small-alphabet corpora match a brute-force span reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val L = 4
    // 3-char alphabet forces dense gram collisions — the adversarial
    // regime for the merge logic (runs, self-overlaps, adjacency)
    val genDoc = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genCorpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genDoc))
    def brute(texts: Seq[String]): Map[Long, (Long, Long, Long)] = {
      val grams = texts.zipWithIndex.flatMap { case (t, di) =>
        (0 to t.length - L).filter(_ => t.length >= L)
          .map(p => (t.substring(p, p + L), di.toLong, p))
      }
      val occ = grams.groupBy(_._1).view.mapValues(_.size).toMap
      texts.zipWithIndex.map { case (t, di) =>
        val masked = Array.fill(t.length)(false)
        if (t.length >= L)
          (0 to t.length - L).foreach { p =>
            if (occ(t.substring(p, p + L)) >= 2)
              (p until p + L).foreach(masked(_) = true)
          }
        // spans = maximal masked runs
        var spans = 0L; var chars = 0L; var in = false
        masked.foreach { m =>
          if (m) { chars += 1; if (!in) spans += 1 }
          in = m
        }
        di.toLong -> ((t.length.toLong, spans, chars))
      }.toMap
    }
    (1 to 12).foreach { i =>
      genCorpus(Gen.Parameters.default, Seed(100L + i)).foreach { texts =>
        val docs = texts.zipWithIndex
          .map { case (t, di) => (di.toLong, t) }.toDF("doc_id", "text")
        val got = Curation.substrSpansOf(docs, l = L).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        assert(got == brute(texts), s"seed ${100 + i}: $texts")
        // the 128-bit twin (VERDICT r10 ask #4) must agree exactly —
        // same plan, wider gram key
        val got128 = Curation.substrSpansOf(docs, l = L, wide = true)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        assert(got128 == brute(texts), s"seed ${100 + i} (128-bit): $texts")
      }
    }
  }

  test("null text rows survive the compiled kernels (r11 review finding #2)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "ABCDEFGHIxxxx"), Row(2L, null))),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true))))
    // the raw codePoints() call NPE'd here; null must read as empty
    val spans = Curation.substrSpansOf(docs, l = 5).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2))).toMap
    assert(spans(2L) == ((-1L, 0L)),
      "null-text doc keeps its report row (NULL n_chars, zero spans)")
    assert(spans.contains(1L))
    val comp = TextAnalysis.compressionPortableOf(docs).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(comp(2L) == ((-1L, -1L)),
      "null text keeps NULL n_chars/est_bytes (len(NULL) oracle parity, ADVICE r11 #2)")
    val enc = TextAnalysis.bpeEncodeDocs(docs, Seq(("A", "B"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(enc(2L) == ((0L, 0L, "")),
      "null text encodes as the zero-word row (no NPE; oracle LEFT-JOIN parity)")
  }

  test("span length hist: bands are dyadic, mass reconciles with the per-doc audit") {
    import spark.implicits._
    val hist = Curation.dedupSpanLengthHist(spark, sfDir).collect()
    assert(hist.nonEmpty)
    val total = hist.map(_.getLong(2)).sum
    val audit = Curation.dedupSubstrSpans(spark, sfDir)
      .agg(sum($"dup_chars")).head().getLong(0)
    assert(total == audit,
      s"band mass $total must equal the per-doc audit's dup mass $audit")
    assert(math.abs(hist.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    hist.foreach { r =>
      val (b, n, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(java.lang.Long.bitCount(b) == 1, s"band_lo $b not a power of 2")
      assert(m >= b * n && m <= (2 * b - 1) * n,
        s"band $b mass $m outside [$b*$n, ${2 * b - 1}*$n]")
    }
  }
}
