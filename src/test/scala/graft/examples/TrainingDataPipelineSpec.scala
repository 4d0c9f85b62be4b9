package graft.examples

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class TrainingDataPipelineSpec extends SparkSpec {

  test("curation pipeline: monotone counts, no dups survive, splits partition the output") {
    val out = java.nio.file.Files.createTempDirectory("tdp").toString
    val s = TrainingDataPipeline.run(spark, sfDir, out)

    assert(s.input >= s.afterQuality)
    assert(s.afterQuality >= s.afterExact)
    assert(s.afterExact >= s.afterNearDup)
    assert(s.afterNearDup > 0)
    assert(s.input > s.afterNearDup, "sf0.001 corpus contains known dups")

    val result = spark.read.parquet(out)
    // splits are exhaustive and the partitioned write preserved rows
    assert(result.count() == s.afterNearDup)
    assert(s.bySplit.values.sum == s.afterNearDup)
    assert(s.bySplit.keySet.subsetOf(Set("train", "val", "test")))

    // no exact dups survive
    val texts = result.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(texts == 0, "exact duplicates survived")

    // no near-dup pairs survive: LSH over the kept docs finds nothing
    val sets = Dedup.shingleSetsOf(result.select(col("doc_id"), col("text")))
    val residual = Dedup.verifyJaccardSets(
      Dedup.candidatePairs(Dedup.lshBucketsFused(sets)), sets, 0.8)
    assert(residual.isEmpty, "near-dup pairs survived curation")
  }

  test("edit-distance-verified pipeline: block → verify → components → representatives end-to-end") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("tdp-ed").toString
    val s = TrainingDataPipeline.run(spark, sfDir, out, editDistVerified = true)
    assert(s.input >= s.afterQuality && s.afterQuality >= s.afterExact &&
      s.afterExact >= s.afterNearDup && s.afterNearDup > 0)
    val result = spark.read.parquet(out)
    assert(result.count() == s.afterNearDup)
    assert(s.bySplit.values.sum == s.afterNearDup)
    val keptIds = result.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.size.toLong == s.afterNearDup, "survivors are distinct")

    // reconstruct the quality+exact survivor stage independently, then
    // check the survivor POLICY: every edit-distance component keeps
    // exactly one member — its longest text, ties to the lowest id —
    // and docs outside any component all survive
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val nTok = graft.ops.TextAnalysis.tokenCount($"text")
    val nonAlpha = length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long")
    val quality = docs.filter(nTok >= 5L && nTok <= 10000L &&
      (nonAlpha.cast("double") / greatest(length($"text").cast("long"), lit(1L))) < 0.3)
    val canonical = quality.withColumn("__h", md5($"text"))
      .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"__h").orderBy($"doc_id".asc)))
      .filter($"__rk" === 1).drop("__h", "__rk")
    val pairs = Dedup.dedupEditDistanceOf(canonical).select($"a", $"b")
    assert(pairs.count() > 0, "sf0.001 must exercise the verify stage (planted near-dups)")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val chars = canonical.select($"doc_id", length($"text").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val memberIds = comps.map(_._1).toSet
    comps.groupBy(_._2).foreach { case (c, ms) =>
      val members = ms.map(_._1)
      val expected = members.map(id => (-chars(id), id)).min._2
      assert(keptIds.intersect(members.toSet) == Set(expected),
        s"component $c must keep exactly its longest member $expected")
    }
    val canonicalIds = canonical.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert((canonicalIds -- memberIds).subsetOf(keptIds),
      "docs outside every component survive untouched")
  }
}
