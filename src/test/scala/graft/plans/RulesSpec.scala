package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def countRegexpReplace(plan: Any): Int =
    "RegExpReplace|regexp_replace".r
      .findAllIn(plan.toString).size

  /** The algebraic fact that licenses the rewrite: every replacement
    * token is a fixed point of all four patterns, so redaction is
    * idempotent on ANY input.
    */
  test("pii_redact is idempotent (the property the optimizer rule relies on)") {
    val fixtures = Seq(
      "mail me a@b.co or visit https://x.example/path?q=1",
      "ip 10.0.0.1 phone 555-123-4567 twice 555-123-4567",
      "<URL> <EMAIL> <IP> <PHONE> already-redacted tokens survive",
      "edge a@b.co@c.de 999.999.999.999 https://a https://b",
      "no pii at all in this line")
    val df = fixtures.toDF("text")
    val once = df.select(graft.ops.TextAnalysis.redactPii($"text")).collect()
    val twice = df.select(graft.ops.TextAnalysis.redactPii(
      graft.ops.TextAnalysis.redactPii($"text"))).collect()
    assert(once.map(_.getString(0)).toSeq == twice.map(_.getString(0)).toSeq)
  }

  test("optimizer rule collapses nested pii_redact chains to one") {
    graft.functions.GraftFunctions.register(spark)
    // parquet-backed, not a literal Seq — ConvertToLocalRelation would
    // constant-fold the whole projection away and hide the chain
    val df = graft.Tables.t(spark, sfDir, "documents").select($"text")
    val single = df.selectExpr("pii_redact(text) AS r")
    val nested = df.selectExpr("pii_redact(pii_redact(text)) AS r")
    val triple = df.selectExpr("pii_redact(pii_redact(pii_redact(text))) AS r")
    assert(countRegexpReplace(single.queryExecution.optimizedPlan) == 4)
    assert(countRegexpReplace(nested.queryExecution.optimizedPlan) == 4,
      s"nested chain not collapsed:\n${nested.queryExecution.optimizedPlan}")
    assert(countRegexpReplace(triple.queryExecution.optimizedPlan) == 4,
      "fixed-point iteration must collapse any depth")
    // and the answers agree
    assert(nested.collect().map(_.getString(0)).toSeq ==
      single.collect().map(_.getString(0)).toSeq)
    assert(triple.collect().map(_.getString(0)).toSeq ==
      single.collect().map(_.getString(0)).toSeq)
  }

  test("rule leaves non-redaction regexp chains untouched") {
    graft.functions.GraftFunctions.register(spark)
    // same outer shape but one replacement token differs — must NOT strip
    val df = graft.Tables.t(spark, sfDir, "documents").select($"text")
    val custom = df.select(
      regexp_replace(graft.ops.TextAnalysis.redactPii($"text"),
        graft.ops.TextAnalysis.PiiPhone, "[TEL]").as("r"))
    assert(countRegexpReplace(custom.queryExecution.optimizedPlan) == 5,
      "a distinct outer regexp_replace is not part of the chain")
  }
}
