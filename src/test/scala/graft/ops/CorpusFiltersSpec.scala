package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusFilters: the C4 rule kernel and line-dedup reassembly are
  * pinned against naive in-memory string replays (independent of both
  * Spark SQL and the DuckDB oracle); readability against the float
  * formula; code-detect and tfidf against hand-built fixtures.
  */
class CorpusFiltersSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The shared deterministic line structure, replayed in plain Scala. */
  private def linesOf(text: String): Seq[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).grouped(8)
      .map(_.mkString(" ")).toSeq

  test("c4: counts, rule attribution, and reassembly match a naive replay") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 60).select("doc_id", "text")
    val got = CorpusFilters.c4Of(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    val raw = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(raw.length == 60 && got.size == 60)
    raw.foreach { case (id, text) =>
      val planted = linesOf(text).zipWithIndex.map { case (ln, idx) =>
        val m = id + idx
        ln + (if (m % 11 == 5) " lorem ipsum" else "") +
          (if (m % 13 == 7) " {" else "") +
          (if (m % 17 == 9) " javascript needed" else "") +
          (if (m % 4 != 3) "." else "")
      }
      def dirty(l: String) = l.contains("lorem ipsum") || l.contains("{") ||
        l.toLowerCase.contains("javascript")
      def punct(l: String) = l.nonEmpty && "[.!?\"]$".r.findFirstIn(l).isDefined
      def words(l: String) = l.trim.split("\\s+").count(_.nonEmpty)
      val kept = planted.filter(l => !dirty(l) && punct(l) && words(l) >= 5)
      val r = got(id)
      assert(r.getAs[Long]("n_lines") == planted.length, s"doc $id n_lines")
      assert(r.getAs[Long]("n_kept") == kept.length, s"doc $id n_kept")
      assert(r.getAs[Long]("n_dropped_dirty") == planted.count(dirty), s"doc $id dirty")
      assert(r.getAs[Long]("n_dropped_punct") ==
        planted.count(l => !dirty(l) && !punct(l)), s"doc $id punct")
      assert(r.getAs[Long]("n_dropped_short") ==
        planted.count(l => !dirty(l) && punct(l) && words(l) < 5), s"doc $id short")
      assert(r.getAs[Long]("kept_words") == kept.map(words).map(_.toLong).sum)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("clean_md5") == md, s"doc $id md5")
      assert(r.getAs[Boolean]("doc_pass") == (kept.length >= 3))
    }
  }

  test("paragraph dedup: global first occurrence survives, later copies drop") {
    val docs = docsDf(Seq(
      (1L, "a b c d e f g h x1 x2 x3 x4 x5 x6 x7 x8"), // lines L1, L2
      (2L, "a b c d e f g h y1 y2 y3 y4 y5 y6 y7 y8"), // L1 dup, L3
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),                 // L2 dup
      (4L, "fresh only line here")))
    val got = CorpusFilters.paragraphDedupOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_removed") == 0)
    assert(got(2L).getAs[Long]("n_removed") == 1) // its copy of L1
    assert(got(3L).getAs[Long]("n_removed") == 1) // its copy of L2
    assert(got(4L).getAs[Long]("n_removed") == 0)
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(2L).getAs[String]("clean_md5") == md5s("y1 y2 y3 y4 y5 y6 y7 y8"))
    assert(got(3L).getAs[String]("clean_md5") == md5s("")) // everything removed
    assert(got(3L).getAs[Double]("kept_frac") == 0.0)
  }

  test("paragraph dedup: intra-doc repeats also deduplicate to the first") {
    val line = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = docsDf(Seq((7L, s"$line $line $line")))
    val r = CorpusFilters.paragraphDedupOf(docs).collect().head
    assert(r.getAs[Long]("n_lines") == 3 && r.getAs[Long]("n_removed") == 2)
  }

  test("readability: rational pair equals the float Flesch formula") {
    val rows = CorpusFilters.taReadability(spark, sfDir).limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("n_words").toDouble
      val sn = r.getAs[Long]("n_sentences").toDouble
      val syl = r.getAs[Long]("n_syllables").toDouble
      val flesch = 206.835 - 1.015 * (w / sn) - 84.6 * (syl / w)
      val grade = 0.39 * (w / sn) + 11.8 * (syl / w) - 15.59
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-9)
      assert(math.abs(r.getAs[Double]("fk_grade") - grade) < 1e-9)
      assert(r.getAs[Long]("n_sentences") == (r.getAs[Long]("n_words") + 7) / 8)
    }
  }

  test("code detect: planted residues classify as code, clean prose does not") {
    val docs = docsDf(Seq(
      (0L, "plain words only here"),            // %9==0 → snippet A
      (1L, "plain words only here"),            // clean
      (4L, "plain words only here"),            // %9==4 → snippet B
      (13L, "plain words only here")))          // %9==4 → snippet B
    val got = CorpusFilters.codeDetectOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Boolean]("is_code"))
    assert(got(4L).getAs[Boolean]("is_code"))
    assert(got(13L).getAs[Boolean]("is_code"))
    assert(!got(1L).getAs[Boolean]("is_code"))
    assert(got(1L).getAs[Long]("score") == 0)
    // snippet A: ' def f(x): { return x * 2; }' → 2 braces, 1 semi, 2 kw, 0 eq
    assert(got(0L).getAs[Long]("score") == 3 * 2 + 3 * 1 + 2 * 2)
  }

  test("source overlap: shared trigrams counted once, jaccard exact") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4", "A"),   // trigrams: {w1 w2 w3, w2 w3 w4}
      (2L, "w1 w2 w3 x", "B"),    // {w1 w2 w3, w2 w3 x}
      (3L, "w1 w2 w3 w4", "B"),   // dup of doc 1's trigrams, same source B
      (4L, "y1 y2 y3", "C"))      // {y1 y2 y3} — no overlap
      .toDF("doc_id", "text", "source")
    val got = CorpusFilters.sourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // A has 2 distinct trigrams, B has 3 (w1w2w3, w2w3x, w2w3w4), C 1
    assert(got.keySet == Set(("A", "B")))
    val (shared, na, nb, jac) = got(("A", "B"))
    assert(shared == 2 && na == 2 && nb == 3)
    assert(math.abs(jac - 2.0 / 3.0) < 1e-15)
  }

  test("funnel: cumulative stages shrink monotonically; stage1 = distinct fingerprints") {
    val rows = CorpusFilters.curationFunnel(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("stage_id"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("all", "exact_dedup", "min_length", "lang_id", "gopher_word_len"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    docs.sliding(2).foreach { w => assert(w(0) >= w(1), "docs must shrink") }
    toks.sliding(2).foreach { w => assert(w(0) >= w(1), "tokens must shrink") }
    val total = graft.Tables.t(spark, sfDir, "documents").count()
    assert(docs(0) == total)
    val distinctFp = graft.Tables.t(spark, sfDir, "documents")
      .select(TextAnalysis.fingerprint(org.apache.spark.sql.functions.col("text")))
      .distinct().count()
    assert(docs(1) == distinctFp, "stage 1 must equal distinct-fingerprint count")
    assert(docs.last > 0, "some docs must survive the full funnel")
  }

  test("tfidf: scores are tf·N/df, descending, tie-broken by term") {
    val docs = docsDf(Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry date"),
      (3L, "apple date date date")))
    val rows = CorpusFilters.tfidfOf(docs).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // doc 1: apple tf=2 df=2 → 2*3/2=3.0; banana tf=1 df=2 → 1.5; cherry 1.5
    val d1 = byDoc(1L).sortBy(_.getAs[Int]("rk"))
    assert(d1.head.getAs[String]("term") == "apple" &&
      d1.head.getAs[Double]("score") == 3.0)
    assert(d1(1).getAs[String]("term") == "banana") // 1.5 tie → term asc
    assert(d1(2).getAs[String]("term") == "cherry")
  }

  /** In-memory replay of the frozen hashed-linear classifier: md5 via
    * MessageDigest, same bucket/weight derivation, integer score —
    * independent of both Spark SQL and the DuckDB oracle.
    */
  private def qcRef(rows: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      TextAnalysis.md5Hex(md, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def weight(b: Long): Long =
      java.lang.Long.parseLong(hex(s"w:$b").substring(0, 4), 16) % 1999 - 999
    rows.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val score = toks.map(tk =>
          weight(java.lang.Long.parseLong(hex(tk).substring(0, 3), 16)
            % CorpusFilters.QcBuckets)).sum
        Some((id, toks.length.toLong, score))
      }
    }.sortBy(_._1)
  }

  test("quality classifier == in-memory md5/weight replay; keep gate consistent") {
    val fixture = Seq(
      (1L, "Alpha beta GAMMA delta epsilon"),
      (2L, "one one one one"),
      (3L, "  padded   whitespace   tokens  "),
      (4L, "mixedCASE Tokens with-punct 42 #tag"))
    val got = CorpusFilters.qualityClassifierOf(docsDf(fixture)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val want = qcRef(fixture)
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == want,
      s"\n got=${got.toSeq}\nwant=$want")
    got.foreach { case (_, n, score, per1k, keep) =>
      assert(per1k == score * 1000.0 / n)
      assert(keep == (score > 0))
    }
    // corpus smoke: every document scores, deterministically
    val corpus = CorpusFilters.taQualityClassifier(spark, sfDir).collect()
    assert(corpus.length == 500)
    val again = CorpusFilters.taQualityClassifier(spark, sfDir).collect()
    assert(corpus.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("RAKE: degree/frequency hand-computed; long-phrase words outrank loners") {
    val s = spark
    import s.implicits._
    // doc: "x y the x" → phrases [x y] (len 2), [x] (len 1)
    // x: freq 2, deg 2+1=3, score 1.5; y: freq 1, deg 2, score 2.0
    val docs = Seq((1L, "x y the x", "s")).toDF("doc_id", "text", "source")
    val got = CorpusFilters.rakeKeywordsOf(docs, topN = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "y", 1L, 2L, 2.0),
      (2L, "x", 2L, 3L, 1.5)))
    // stopwords never appear as keywords
    assert(!got.exists(r => CorpusFilters.RakeStops.contains(r._2)))
  }

  test("ngram coverage: hand-counted types, single-token docs yield no bigrams") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A b a", "s1"),   // tokens a,b,a → uni {a,b}; bigrams "a b","b a"
      (2L, "c", "s1"),       // single token: no bigrams
      (3L, "x y x y", "s2")) // uni {x,y}; bigrams "x y","y x"
      .toDF("doc_id", "text", "source")
    val got = CorpusFilters.ngramCoverageOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got("s1") == ((2L, 4L, 3L, 2L, 3.0 / 4)))
    assert(got("s2") == ((1L, 4L, 2L, 2L, 2.0 / 4)))
  }

  test("ScalaCheck: TVD in [0,1] and equals a JVM replay; simpson bounds hold") {
    import org.scalacheck.Gen
    val s = spark
    import s.implicits._
    val genDocs = for {
      k <- Gen.choose(2, 4)
      docs <- Gen.nonEmptyListOf(for {
        src <- Gen.choose(0, k - 1)
        words <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
      } yield (src, words.mkString(" ")))
    } yield docs
    (0 until 25).foreach { seed =>
      genDocs(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed.toLong)).foreach { raw =>
        val docs = raw.zipWithIndex
          .map { case ((src, text), i) => (i.toLong, text, s"s$src") }
          .toDF("doc_id", "text", "source")
        val tvd = CorpusFilters.sourceDivergenceOf(docs).collect()
          .map(r => r.getString(0) -> r.getDouble(4)).toMap
        tvd.values.foreach(v =>
          assert(v >= 0.0 && v <= 1.0, s"seed $seed: tvd $v out of [0,1]"))
        // JVM replay: exact distributions per source vs corpus
        val toks = raw.zipWithIndex.flatMap { case ((src, text), _) =>
          text.split("\\s+").filter(_.nonEmpty).map(w => (s"s$src", w))
        }
        val corpus = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val dTot = toks.size.toLong
        toks.groupBy(_._1).foreach { case (src, st) =>
          val c = st.groupBy(_._2).view.mapValues(_.size.toLong).toMap
          val cTot = st.size.toLong
          val num = corpus.keys.map { w =>
            math.abs(c.getOrElse(w, 0L) * dTot - corpus(w) * cTot)
          }.sum
          val want = num.toDouble / (2.0 * cTot.toDouble * dTot.toDouble)
          assert(math.abs(tvd(src) - want) < 1e-12,
            s"seed $seed $src: tvd ${tvd(src)} != replay $want")
        }
        val simp = CorpusFilters.simpsonDiversityOf(docs).collect()
          .map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5)))
        simp.foreach { case (vocab, simpson, eff) =>
          assert(simpson >= 1.0 / vocab - 1e-12 && simpson <= 1.0 + 1e-12)
          assert(eff <= vocab + 1e-9, s"effective vocab $eff > vocab $vocab")
        }
      }
    }
  }

  test("simpson diversity: hand-computed; template source collapses to 1 effective token") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x x y", "A"),     // c={x:2,y:1}: simpson 5/9, eff 9/5
      (2L, "a b", "B"),       // uniform pair: simpson 1/2, eff 2
      (3L, "t t t t", "T"))   // pure template: simpson 1, eff 1
      .toDF("doc_id", "text", "source")
    val got = CorpusFilters.simpsonDiversityOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("A", 3L, 2L, 5L, 5.0 / 9, 9.0 / 5),
      ("B", 2L, 2L, 2L, 0.5, 2.0),
      ("T", 4L, 1L, 16L, 1.0, 1.0)))
  }

  test("source divergence: hand-computed TVD via the OOV-mass identity") {
    val s = spark
    import s.implicits._
    // A: "x x y" (C=3), B: "x z" (C=2); corpus x3 y1 z1 (D=5)
    // p_A=(2/3,1/3,0) vs p=(3/5,1/5,1/5): TVD = 0.2; p_B: TVD = 0.3
    val docs = Seq((1L, "x x y", "A"), (2L, "x z", "B"))
      .toDF("doc_id", "text", "source")
    val gotSeq = CorpusFilters.sourceDivergenceOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(gotSeq.toSeq == Seq(
      ("A", 3L, 2L, 6L, 0.2), ("B", 2L, 2L, 6L, 0.3)))
    // identical distributions diverge by zero
    val same = Seq((1L, "x y", "A"), (2L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    assert(CorpusFilters.sourceDivergenceOf(same).collect()
      .forall(_.getDouble(4) == 0.0))
  }

  test("heaps curve: hand-computed vocabulary growth at each decile") {
    val s = spark
    import s.implicits._
    // tokens in doc_id order: a b a | c a -> N=5; first occurrence:
    // a@1, b@2, c@4; boundary(d)=ceil(5d/10) -> 1,1,2,2,3,3,4,4,5,5
    val docs = Seq((1L, "a b a"), (2L, "c a")).toDF("doc_id", "text")
    val got = CorpusFilters.heapsCurveOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 2L, 2L), (4L, 2L, 2L),
      (5L, 3L, 2L), (6L, 3L, 2L), (7L, 4L, 3L), (8L, 4L, 3L),
      (9L, 5L, 3L), (10L, 5L, 3L)))
    // the curve is monotone in both tokens_seen and vocab
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("ngram coverage: empty/whitespace-only docs don't crash (ADVICE r7)") {
    val s = spark
    import s.implicits._
    // a zero-token doc used to pass slice length -1 and throw at runtime
    val docs = Seq(
      (1L, "", "s1"),
      (2L, "   ", "s1"),
      (3L, "a b", "s1"))
      .toDF("doc_id", "text", "source")
    val got = CorpusFilters.ngramCoverageOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // 3 docs, 2 tokens total, uni {a,b}, one bigram "a b"
    assert(got("s1") == ((3L, 2L, 2L, 1L)))
  }
}
