package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization probes: isolated min-of-N timings of
  * alternative physical shapes for the LM-family trunks, run under the
  * bench session config (local[$SPARK_GRAFT_CPUS], shuffle.partitions =
  * cpus, noop sink). Usage:
  *   sbt "runMain graft.ProbeR17 <exp> [sfDir]"
  * Experiments print [probe] lines only — never part of the bench
  * protocol; this main exists so optimization claims in
  * OPTIMIZATION_r17.md are backed by reproducible commands.
  */
object ProbeR17 {

  def main(args: Array[String]): Unit = {
    val exp = args.headOption.getOrElse("quadgram")
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def timeMin(label: String, sweeps: Int = 4)(mk: => DataFrame): Double = {
      noop(mk) // warm
      val t = (1 to sweeps).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $label%-40s $t%8.3f s (min of $sweeps)")
      t
    }

    val docs = Tables.t(spark, sfDir, "documents")

    exp match {
      case "quadgram" =>
        // A: current shape — nested zip_with HOFs (interpreted lambdas)
        timeMin("qocc zip_with (current)") {
          graft.ops.TextAnalysis.lmQuadgramsOf(docs)
            .groupBy($"doc_id", $"a", $"b", $"c", $"d")
            .agg(count(lit(1)).as("n_occ"))
        }
        // B: compiled flatMap kernel emitting the same rows
        timeMin("qocc flatMap kernel") {
          docs.select($"doc_id", $"text").as[(Long, String)]
            .flatMap { case (id, text) =>
              val ws = text.trim.split("\\s+").filter(_.nonEmpty)
              if (ws.length < 4) Iterator.empty
              else (0 to ws.length - 4).iterator.map(i =>
                (id, ws(i), ws(i + 1), ws(i + 2), ws(i + 3)))
            }
            .toDF("doc_id", "a", "b", "c", "d")
            .groupBy($"doc_id", $"a", $"b", $"c", $"d")
            .agg(count(lit(1)).as("n_occ"))
        }
        // C: trigram stream, both shapes
        timeMin("tocc zip_with (current)") {
          graft.ops.TextAnalysis.lmTrigramsOf(docs)
            .groupBy($"doc_id", $"a", $"b", $"c")
            .agg(count(lit(1)).as("n_occ"))
        }
        timeMin("tocc flatMap kernel") {
          docs.select($"doc_id", $"text").as[(Long, String)]
            .flatMap { case (id, text) =>
              val ws = text.trim.split("\\s+").filter(_.nonEmpty)
              if (ws.length < 3) Iterator.empty
              else (0 to ws.length - 3).iterator.map(i =>
                (id, ws(i), ws(i + 1), ws(i + 2)))
            }
            .toDF("doc_id", "a", "b", "c")
            .groupBy($"doc_id", $"a", $"b", $"c")
            .agg(count(lit(1)).as("n_occ"))
        }

      case "kn4parts" =>
        // stage decomposition of ta_lm_kn4: where does the time go?
        timeMin("full ta_lm_kn4") {
          graft.ops.TextAnalysis.taLmKn4(spark, sfDir)
        }
        timeMin("qocc agg only") {
          graft.ops.TextAnalysis.lmQuadgramsOf(docs)
            .groupBy($"doc_id", $"a", $"b", $"c", $"d")
            .agg(count(lit(1)).as("n_occ"))
        }
        timeMin("scored lexicon only") {
          graft.ops.TextAnalysis.lmKn4Scored(docs)._2
        }
        timeMin("vdf (vocab count) only") {
          graft.ops.TextAnalysis.lmTokensOf(docs)
            .select($"w").distinct().agg(count(lit(1)).as("v"))
        }

      case "trich" =>
        import graft.ops.Scale.GatedCheckpoint
        import graft.ops.TextAnalysis.{lmTokensOf, lmBigramsOf, lmTrigramsOf}
        timeMin("ta_lm_trigram (current)") {
          graft.ops.TextAnalysis.taLmTrigram(spark, sfDir)
        }
        // variant: tocc checkpointed (trunk once), uni/bcnt checkpointed
        timeMin("ta_lm_trigram (ck tocc+uni+bcnt)") {
          val docs2 = docs
          val uni = lmTokensOf(docs2).groupBy($"w")
            .agg(count(lit(1)).as("c_w")).gatedCheckpoint(eager = false)
          val bcnt = lmBigramsOf(docs2)
            .groupBy($"prev", $"w").agg(count(lit(1)).as("c_bw"))
            .gatedCheckpoint(eager = false)
          val tocc = lmTrigramsOf(docs2)
            .groupBy($"doc_id", $"a", $"b", $"c")
            .agg(count(lit(1)).as("n_occ")).gatedCheckpoint(eager = false)
          val tcnt = tocc.groupBy($"a", $"b", $"c")
            .agg(sum($"n_occ").as("c_t"))
          val lex = tocc.select($"a", $"b", $"c").distinct()
          val vdf = uni.agg(count(lit(1)).as("v"))
          val scored = lex
            .join(tcnt, Seq("a", "b", "c"), "left")
            .join(bcnt.select($"prev".as("b"), $"w".as("c"),
              $"c_bw".as("c_bc")), Seq("b", "c"))
            .join(uni.select($"w".as("b"), $"c_w".as("c_b")), Seq("b"))
            .join(bcnt.select($"prev".as("a"), $"w".as("b"),
              $"c_bw".as("c_ab")), Seq("a", "b"), "left")
            .crossJoin(broadcast(vdf))
            .select($"a", $"b", $"c",
              when(coalesce($"c_t", lit(0L)) >= 2,
                (length(conv(expr("(c_ab + v) DIV (c_t + 1)"), 10, 2)) - 1)
                  .cast("long"))
                .otherwise(
                  (length(conv(expr("(c_b + v) DIV (c_bc + 1)"), 10, 2)))
                    .cast("long"))
                .as("bits"),
              when(coalesce($"c_t", lit(0L)) >= 2, lit(0L))
                .otherwise(lit(1L)).as("backoff"))
          tocc
            .join(scored, Seq("a", "b", "c"))
            .groupBy($"doc_id")
            .agg(sum($"n_occ").as("n_trigrams"),
              sum($"backoff" * $"n_occ").as("n_backoff"),
              sum($"bits" * $"n_occ").as("total_bits"))
            .select($"doc_id", $"n_trigrams", $"n_backoff", $"total_bits",
              ($"total_bits".cast("double") / $"n_trigrams".cast("double"))
                .as("bits_per_trigram"))
            .orderBy("doc_id")
        }

      case "kn4nock" =>
        import graft.ops.TextAnalysis.{lmQuadgramsOf, lmTokensOf}
        timeMin("ta_lm_kn4 (current: qocc+qcnt ck)") {
          graft.ops.TextAnalysis.taLmKn4(spark, sfDir)
        }
        timeMin("ta_lm_kn4 (no checkpoints, one DAG)") {
          val qocc = lmQuadgramsOf(docs)
            .groupBy($"doc_id", $"a", $"b", $"c", $"d")
            .agg(count(lit(1)).as("n_occ"))
          val qcnt = qocc.groupBy($"a", $"b", $"c", $"d")
            .agg(sum($"n_occ").as("c4"))
          val ctx4 = qcnt.groupBy($"a", $"b", $"c")
            .agg(sum($"c4").as("ctx4"))
          val cont3 = qcnt.groupBy($"b", $"c", $"d")
            .agg(count(lit(1)).as("cont3"))
          val ctx3 = qcnt.groupBy($"b", $"c").agg(count(lit(1)).as("ctx3"))
          val cont2 = cont3.groupBy($"c", $"d")
            .agg(count(lit(1)).as("cont2"))
          val ctx2 = cont3.groupBy($"c").agg(count(lit(1)).as("ctx2"))
          val cont1 = cont2.groupBy($"d").agg(count(lit(1)).as("cont1"))
          val vdf = lmTokensOf(docs).select($"w").distinct()
            .agg(count(lit(1)).as("v"))
          val scalars = vdf.crossJoin(cont2.agg(count(lit(1)).as("ctx1")))
          val c4v = coalesce($"c4", lit(0L))
          val cont3v = coalesce($"cont3", lit(0L))
          val cont2v = coalesce($"cont2", lit(0L))
          val level = when(c4v >= 2, lit(0L))
            .when(cont3v >= 2, lit(1L))
            .when(cont2v >= 2, lit(2L))
            .otherwise(lit(3L))
          val bits = when(c4v >= 2,
              (length(conv(expr(
                "(ctx4 + v) DIV (coalesce(c4, 0) + 1)"), 10, 2)) - 1)
                .cast("long"))
            .when(cont3v >= 2,
              length(conv(expr(
                "(ctx3 + v) DIV (coalesce(cont3, 0) + 1)"), 10, 2))
                .cast("long"))
            .when(cont2v >= 2,
              (length(conv(expr(
                "(ctx2 + v) DIV (coalesce(cont2, 0) + 1)"), 10, 2)) + 1)
                .cast("long"))
            .otherwise(
              (length(conv(expr("(ctx1 + v) DIV (cont1 + 1)"), 10, 2)) + 2)
                .cast("long"))
          val scored = qcnt
            .join(ctx4, Seq("a", "b", "c"), "left")
            .join(cont3, Seq("b", "c", "d"), "left")
            .join(ctx3, Seq("b", "c"), "left")
            .join(cont2, Seq("c", "d"), "left")
            .join(ctx2, Seq("c"), "left")
            .join(cont1, Seq("d"))
            .crossJoin(broadcast(scalars))
            .select($"a", $"b", $"c", $"d", $"c4",
              level.as("level"), bits.as("bits"))
          qocc
            .join(scored, Seq("a", "b", "c", "d"))
            .groupBy($"doc_id")
            .agg(sum($"n_occ").as("n_quadgrams"),
              sum(when($"level" >= 1, $"n_occ").otherwise(0L)).as("n_backoff"),
              sum($"bits" * $"n_occ").as("total_bits"))
            .select($"doc_id", $"n_quadgrams", $"n_backoff", $"total_bits",
              ($"total_bits".cast("double") / $"n_quadgrams".cast("double"))
                .as("bits_per_quadgram"))
            .orderBy("doc_id")
        }

      case "kn4chain" =>
        import graft.ops.Scale.GatedCheckpoint
        import graft.ops.TextAnalysis.{lmQuadgramsOf, lmTokensOf}
        timeMin("kn4 scored (current 6-join chain)") {
          graft.ops.TextAnalysis.lmKn4Scored(docs)._2
        }
        timeMin("kn4 scored (collapsed bcd-model)") {
          val qocc = lmQuadgramsOf(docs)
            .groupBy($"doc_id", $"a", $"b", $"c", $"d")
            .agg(count(lit(1)).as("n_occ"))
            .gatedCheckpoint(eager = false)
          val qcnt = qocc.groupBy($"a", $"b", $"c", $"d")
            .agg(sum($"n_occ").as("c4")).gatedCheckpoint()
          val ctx4 = qcnt.groupBy($"a", $"b", $"c")
            .agg(sum($"c4").as("ctx4"))
          val cont3 = qcnt.groupBy($"b", $"c", $"d")
            .agg(count(lit(1)).as("cont3"))
          val ctx3 = qcnt.groupBy($"b", $"c").agg(count(lit(1)).as("ctx3"))
          val cont2 = cont3.groupBy($"c", $"d")
            .agg(count(lit(1)).as("cont2"))
          val ctx2 = cont3.groupBy($"c").agg(count(lit(1)).as("ctx2"))
          val cont1 = cont2.groupBy($"d").agg(count(lit(1)).as("cont1"))
          val vdf = lmTokensOf(docs).select($"w").distinct()
            .agg(count(lit(1)).as("v"))
          val scalars = vdf.crossJoin(cont2.agg(count(lit(1)).as("ctx1")))
          // backoff model collapsed at (b,c,d): the four lower-level
          // tables attach at trigram-lexicon mass, and the chosen
          // backoff level/bits precompute into two narrow columns
          val cont3v = coalesce($"cont3", lit(0L))
          val cont2v = coalesce($"cont2", lit(0L))
          val bo = cont3
            .join(ctx3, Seq("b", "c"), "left")
            .join(cont2, Seq("c", "d"), "left")
            .join(ctx2, Seq("c"), "left")
            .join(cont1, Seq("d"))
            .crossJoin(broadcast(scalars))
            .select($"b", $"c", $"d", $"cont3",
              when(cont3v >= 2, lit(1L)).when(cont2v >= 2, lit(2L))
                .otherwise(lit(3L)).as("bo_level"),
              when(cont3v >= 2,
                  length(conv(expr(
                    "(ctx3 + v) DIV (coalesce(cont3, 0) + 1)"), 10, 2))
                    .cast("long"))
                .when(cont2v >= 2,
                  (length(conv(expr(
                    "(ctx2 + v) DIV (coalesce(cont2, 0) + 1)"), 10, 2)) + 1)
                    .cast("long"))
                .otherwise(
                  (length(conv(expr("(ctx1 + v) DIV (cont1 + 1)"), 10, 2)) + 2)
                    .cast("long"))
                .as("bo_bits"),
              $"v")
          val c4v = coalesce($"c4", lit(0L))
          qcnt
            .join(ctx4, Seq("a", "b", "c"), "left")
            .join(bo, Seq("b", "c", "d"))
            .select($"a", $"b", $"c", $"d", $"c4",
              when(c4v >= 2, lit(0L)).otherwise($"bo_level").as("level"),
              when(c4v >= 2,
                  (length(conv(expr(
                    "(ctx4 + v) DIV (coalesce(c4, 0) + 1)"), 10, 2)) - 1)
                    .cast("long"))
                .otherwise($"bo_bits").as("bits"))
        }

      case "substr" =>
        import graft.ops.Curation
        timeMin("dedup_substr_spans (current)") {
          Curation.dedupSubstrSpans(spark, sfDir)
        }
        // variant: occurrence filter as agg + left-semi join instead of
        // the h-partitioned count window (no per-partition sort; AQE
        // skew-join applies where a window partition cannot be split)
        timeMin("substr_spans (agg + semi-join)") {
          val docsIn = Tables.t(spark, sfDir, "documents")
          val l = 32L
          val docLens = docsIn.select($"doc_id",
            length($"text").cast("long").as("n_chars"))
          val grams = Curation.substrGramsOf(docsIn, 32, wide = false)
          val dup = grams.groupBy($"h").agg(count(lit(1)).as("occ"))
            .filter($"occ" >= 2L).select($"h")
          val marks = grams.join(dup.hint("shuffle_hash"), Seq("h"), "left_semi")
            .select($"doc_id", $"p")
          val perDoc = Curation.coalesceFixedSpans(marks, l)
            .groupBy($"doc_id")
            .agg(count(lit(1)).as("n_spans"),
              sum($"ep" - $"sp").as("dup_chars"))
          docLens.select($"doc_id", $"n_chars")
            .join(perDoc, Seq("doc_id"), "left")
            .select($"doc_id", $"n_chars",
              coalesce($"n_spans", lit(0L)).as("n_spans"),
              coalesce($"dup_chars", lit(0L)).as("dup_chars"),
              when($"n_chars" > 0L,
                coalesce($"dup_chars", lit(0L)).cast("double") /
                  $"n_chars".cast("double")).as("dup_frac"))
            .orderBy($"doc_id")
        }

      case "plans" =>
        // batch plan capture: args(2) = comma-separated query names,
        // args(3) = output suffix (before/after). Writes
        // plans/r17/<q>_<suffix>.txt with the formatted plan + a
        // [planprobe]-style node-count line, all in ONE JVM.
        val names = args(2).split(",").toSeq.filter(_.nonEmpty)
        val suffix = if (args.length > 3) args(3) else "before"
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val p = df.queryExecution.executedPlan.toString
          def n(pat: String) = pat.r.findAllIn(p).size
          val counts = s"[planprobe] $name scans=${n("Scan parquet|FileScan")} " +
            s"exchange=${n("Exchange (hash|range|single)")} " +
            s"reusedExchange=${n("ReusedExchange")} " +
            s"bcastExchange=${n("BroadcastExchange")} " +
            s"window=${n("Window")} agg=${n("HashAggregate|SortAggregate|ObjectHashAggregate")} " +
            s"sortMergeJoin=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} " +
            s"bnlj=${n("BroadcastNestedLoopJoin")} cartesian=${n("CartesianProduct")}"
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"/root/repo/plans/r17/${name}_$suffix.txt"),
            (formatted + "\n" + counts + "\n").getBytes("UTF-8"))
          println(counts)
        }

      case other =>
        System.err.println(s"unknown experiment: $other")
    }

    spark.stop()
  }
}
