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
}
