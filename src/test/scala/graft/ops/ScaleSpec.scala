package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val events = graft.Tables.t(spark, sfDir, "events")
    val direct = events.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").cast("decimal(18,4)").as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    val salted = Scale.saltedAggregate(
      events, $"event_type", salts = 7,
      Seq(
        (count(lit(1)), sum(col("n")), "n"),
        (sum($"value".cast("decimal(18,4)")).cast("decimal(18,4)"),
          sum(col("total")).cast("decimal(18,4)"), "total")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2)))).toMap
    assert(salted == direct)
  }

  test("bucketed join plans without a shuffle exchange on either side") {
    import spark.implicits._
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val customer = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val joined = Scale.bucketedJoin(spark, orders, customer,
      "b_orders", "b_customer", "o_custkey", buckets = 4)
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // sanity: result matches a plain join
    val expected = orders.join(customer, "o_custkey").count()
    assert(joined.count() == expected)
  }
}
