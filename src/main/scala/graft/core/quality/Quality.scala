package graft.core.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.schema.{SchemaConverter, SchemaDefinition}

/** Data-quality checks (reference: core/quality/checks.py + types.py).
  *
  * Each factory returns a DataQualityCheck whose check function runs a
  * SINGLE aggregation action against a view — unlike the reference, which
  * issues two actions for null/unique/range checks. At 100 TB one scan
  * per check instead of two is the difference that matters; partial
  * aggregation keeps the shuffle at one row per check.
  */
final case class CheckResult(
    name: String,
    passed: Boolean,
    message: String,
    metrics: Map[String, Double] = Map.empty)

sealed abstract class CheckTiming(val name: String)
object CheckTiming {
  case object BeforePipeline extends CheckTiming("before_pipeline")
  case object AfterPipeline extends CheckTiming("after_pipeline")
  case object AfterComponent extends CheckTiming("after_component")
}

sealed abstract class FailureMode(val name: String)
object FailureMode {
  /** Check failure fails the pipeline run's quality summary. */
  case object FailOnError extends FailureMode("fail_on_error")
  /** Check failure is logged only. */
  case object WarnOnly extends FailureMode("warn_only")
  /** Fail only after maxFailures accumulated failures. */
  case object Threshold extends FailureMode("threshold")
}

final case class DataQualityCheck(
    name: String,
    timing: CheckTiming,
    check: SparkSession => CheckResult,
    componentName: Option[String] = None,
    failureMode: FailureMode = FailureMode.FailOnError,
    maxFailures: Int = 0)

object Checks {

  /** COUNT(*) >= minRows (checks.py:14-37). */
  def rowCountCheck(table: String, minRows: Long): DataQualityCheck =
    DataQualityCheck(s"row_count_$table", CheckTiming.AfterPipeline, { spark =>
      val n = spark.table(table).count()
      CheckResult(s"row_count_$table", n >= minRows,
        s"$table has $n rows (min $minRows)", Map("row_count" -> n.toDouble))
    })

  /** Null ratio ≤ maxNullPct, single pass (checks.py:40-67). */
  def nullCheck(table: String, column: String, maxNullPct: Double): DataQualityCheck =
    DataQualityCheck(s"null_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val row = spark.table(table).agg(
        sum(when(col(column).isNull, 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("total")).head()
      val nulls = Option(row.getAs[Any]("nulls")).fold(0L)(_.asInstanceOf[Long])
      val total = row.getAs[Long]("total")
      val pct = if (total == 0) 0.0 else nulls * 100.0 / total
      CheckResult(s"null_${table}_$column", pct <= maxNullPct,
        f"$table.$column null ratio $pct%.2f%% (max $maxNullPct%%)",
        Map("null_count" -> nulls.toDouble, "null_pct" -> pct))
    })

  /** COUNT(*) == COUNT(DISTINCT cols); composite keys supported
    * (checks.py:70-107). Exact by default; pass approx=true for an HLL
    * pre-check at corpus scale (SURVEY §7.3).
    */
  def uniqueCheck(table: String, columns: Seq[String], approx: Boolean = false): DataQualityCheck =
    DataQualityCheck(s"unique_${table}_${columns.mkString("_")}", CheckTiming.AfterPipeline, { spark =>
      val cols = columns.map(col)
      // struct() wrapping keeps rows with null key parts in the distinct
      // count (matching the reference's df.select(cols).distinct().count()
      // — bare countDistinct would drop any row with a null column)
      val distinctAgg =
        if (approx) approx_count_distinct(struct(cols: _*))
        else countDistinct(struct(cols: _*))
      val row = spark.table(table)
        .agg(count(lit(1)).as("total"), distinctAgg.as("distinct")).head()
      val total = row.getAs[Long]("total")
      val dist = row.getAs[Long]("distinct")
      val ok = if (approx) dist >= (total * 0.99).toLong else dist == total
      CheckResult(s"unique_${table}_${columns.mkString("_")}", ok,
        s"$table(${columns.mkString(",")}): $dist distinct of $total rows" +
          (if (approx) " (approximate)" else ""),
        Map("total" -> total.toDouble, "distinct" -> dist.toDouble))
    })

  /** No values outside [min,max], single pass (checks.py:110-174). */
  def rangeCheck(
      table: String, column: String,
      min: Option[Double] = None, max: Option[Double] = None): DataQualityCheck = {
    require(min.nonEmpty || max.nonEmpty, "range_check needs min and/or max")
    DataQualityCheck(s"range_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val c = col(column)
      val outside = (min, max) match {
        case (Some(lo), Some(hi)) => c < lo || c > hi
        case (Some(lo), None) => c < lo
        case (None, Some(hi)) => c > hi
        case _ => lit(false)
      }
      val row = spark.table(table).agg(
        sum(when(outside, 1L).otherwise(0L)).as("violations"),
        count(lit(1)).as("total")).head()
      val v = Option(row.getAs[Any]("violations")).fold(0L)(_.asInstanceOf[Long])
      CheckResult(s"range_${table}_$column", v == 0,
        s"$table.$column: $v values outside [${min.getOrElse("-inf")}, ${max.getOrElse("inf")}]",
        Map("violations" -> v.toDouble))
    })
  }

  /** Declared fields present with matching Spark DDL type names
    * (checks.py:194-255). Driver-side only — no job runs.
    */
  def schemaCheck(table: String, expected: SchemaDefinition, checkTypes: Boolean = true): DataQualityCheck =
    DataQualityCheck(s"schema_$table", CheckTiming.AfterPipeline, { spark =>
      val actual = spark.table(table).schema
      val problems = expected.fields.flatMap { f =>
        actual.fields.find(_.name == f.name) match {
          case None => Some(s"missing field ${f.name}")
          case Some(af) if checkTypes &&
            af.dataType != SchemaConverter.toSparkType(f.dataType) =>
            Some(s"field ${f.name}: expected ${f.dataType.ddl}, got ${af.dataType.simpleString}")
          case _ => None
        }
      }
      CheckResult(s"schema_$table", problems.isEmpty,
        if (problems.isEmpty) s"$table schema ok" else problems.mkString("; "))
    })

  /** Percentile bound check (beyond-reference): approx quantile of a
    * numeric column must stay within [min,max]. Uses approx_percentile
    * (t-digest sketch, mergeable map-side) — one pass at any scale, no
    * exact-sort shuffle.
    */
  def percentileCheck(
      table: String, column: String, percentile: Double,
      min: Option[Double] = None, max: Option[Double] = None,
      accuracy: Int = 10000): DataQualityCheck = {
    require(percentile >= 0 && percentile <= 1, "percentile must be in [0,1]")
    require(min.nonEmpty || max.nonEmpty, "percentile_check needs min and/or max")
    DataQualityCheck(s"pct_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val row = spark.table(table).agg(
        expr(s"approx_percentile($column, $percentile, $accuracy)").as("p")).head()
      val p = row.getAs[Any]("p") match {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case other => String.valueOf(other).toDouble
      }
      val ok = min.forall(p >= _) && max.forall(p <= _)
      CheckResult(s"pct_${table}_$column", ok,
        f"$table.$column p$percentile%.2f = $p%.4f " +
          s"(bounds [${min.getOrElse("-inf")}, ${max.getOrElse("inf")}])",
        Map("percentile_value" -> p))
    })
  }

  /** Pattern check: share of non-null values matching `regex` must be
    * ≥ minMatchPct. Listed in the reference's CHANGELOG 1.0.0 inventory
    * (`pattern_check`) but never implemented there — present here for
    * real. Single conditional-count pass; rlike is codegen'd.
    */
  def patternCheck(
      table: String, column: String, regex: String,
      minMatchPct: Double = 100.0): DataQualityCheck =
    DataQualityCheck(s"pattern_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val row = spark.table(table).filter(col(column).isNotNull).agg(
        sum(when(col(column).rlike(regex), 1L).otherwise(0L)).as("matches"),
        count(lit(1)).as("total")).head()
      val m = Option(row.getAs[Any]("matches")).fold(0L)(_.asInstanceOf[Long])
      val total = row.getAs[Long]("total")
      val pct = if (total == 0) 100.0 else m * 100.0 / total
      CheckResult(s"pattern_${table}_$column", pct >= minMatchPct,
        f"$table.$column: $pct%.2f%% match '$regex' (min $minMatchPct%%)",
        Map("match_pct" -> pct, "matches" -> m.toDouble))
    })

  /** Referential-integrity check (beyond-reference): every non-null
    * child key must exist in the parent table. Runs as a LEFT ANTI join
    * — Catalyst broadcasts the parent side when it's dimension-sized, so
    * at 100 TB the fact table streams through without a shuffle.
    */
  def referentialCheck(
      childTable: String, childCol: String,
      parentTable: String, parentCol: String): DataQualityCheck =
    DataQualityCheck(s"ref_${childTable}_$childCol", CheckTiming.AfterPipeline, { spark =>
      val orphans = spark.table(childTable)
        .filter(col(childCol).isNotNull)
        .join(spark.table(parentTable), col(childCol) === col(parentCol), "left_anti")
        .count()
      CheckResult(s"ref_${childTable}_$childCol", orphans == 0,
        s"$childTable.$childCol → $parentTable.$parentCol: $orphans orphan keys",
        Map("orphans" -> orphans.toDouble))
    })

  /** Freshness check (beyond-reference): max(tsColumn) must be within
    * maxAge of `asOf`. The caller supplies `asOf` so runs are
    * reproducible; production passes Instant.now(). One MAX aggregation
    * — partial map-side, a single long per partition to the driver.
    */
  def freshnessCheck(
      table: String, tsColumn: String,
      maxAge: java.time.Duration, asOf: java.time.Instant): DataQualityCheck =
    DataQualityCheck(s"fresh_${table}_$tsColumn", CheckTiming.AfterPipeline, { spark =>
      val row = spark.table(table).agg(max(col(tsColumn)).as("max_ts")).head()
      Option(row.getAs[java.sql.Timestamp]("max_ts")) match {
        case None =>
          CheckResult(s"fresh_${table}_$tsColumn", passed = false, s"$table is empty")
        case Some(ts) =>
          val age = java.time.Duration.between(ts.toInstant, asOf)
          CheckResult(s"fresh_${table}_$tsColumn", age.compareTo(maxAge) <= 0,
            s"$table.$tsColumn newest=$ts age=${age.toMillis}ms (max ${maxAge.toMillis}ms)",
            Map("age_ms" -> age.toMillis.toDouble))
      }
    })

  /** Benford first-digit check (beyond-reference): the first
    * significant digit of a numeric column must track Benford's law
    * within `maxDeviation` per digit — the classic fabricated-data /
    * corrupted-feed screen. One scan: a 9-group aggregation; the
    * 9-row digit table folds on the driver. First digits come from the
    * shortest-roundtrip string rendering (see
    * queries.QualityQueries.dqBenford for the engine-portability
    * argument).
    */
  def benfordCheck(
      table: String, column: String,
      maxDeviation: Double = 0.05): DataQualityCheck =
    DataQualityCheck(s"benford_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val shares = Map(
        "1" -> 0.301029995663981, "2" -> 0.176091259055681,
        "3" -> 0.124938736608300, "4" -> 0.096910013008056,
        "5" -> 0.079181246047625, "6" -> 0.066946789630613,
        "7" -> 0.057991946977687, "8" -> 0.051152522447381,
        "9" -> 0.045757490560675)
      val counts = spark.table(table)
        .select(regexp_extract(col(column).cast("string"), "[1-9]", 0).as("d"))
        .filter(col("d") =!= "")
        .groupBy(col("d")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = counts.values.sum
      if (total == 0L)
        CheckResult(s"benford_${table}_$column", passed = false,
          s"$table.$column has no nonzero values")
      else {
        val devs = shares.map { case (d, p) =>
          d -> math.abs(counts.getOrElse(d, 0L).toDouble / total - p)
        }
        val (worstD, worstDev) = devs.maxBy { case (d, v) => (v, d) }
        CheckResult(s"benford_${table}_$column", worstDev <= maxDeviation,
          f"$table.$column worst digit $worstD dev $worstDev%.4f (max $maxDeviation%.4f, n=$total)",
          Map("worst_dev" -> worstDev, "n" -> total.toDouble))
      }
    })

  /** Category-share check (beyond-reference): the fraction of rows with
    * `column = value` must lie in [minShare, maxShare] — a cheap drift
    * detector for label/category distributions. Single aggregation pass.
    */
  def distributionCheck(
      table: String, column: String, value: String,
      minShare: Double, maxShare: Double): DataQualityCheck =
    DataQualityCheck(s"dist_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val row = spark.table(table).agg(
        sum(when(col(column) === value, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("total")).head()
      val hits = Option(row.getAs[Any]("hits")).fold(0L)(_.asInstanceOf[Long])
      val total = row.getAs[Long]("total")
      val share = if (total == 0) 0.0 else hits.toDouble / total
      CheckResult(s"dist_${table}_$column", share >= minShare && share <= maxShare,
        f"$table.$column='$value' share $share%.4f (bounds [$minShare, $maxShare])",
        Map("share" -> share, "hits" -> hits.toDouble))
    })

  /** Anomaly check (beyond-ref): the share of |z| > `zThreshold`
    * outliers per `groupCol` group must stay ≤ maxOutlierPct. Statistics
    * are engine-exact (integer-cents sums, fixed IEEE derivation — see
    * QualityQueries.dqAnomaly), so the gate's answer is reproducible
    * across runs and partitionings; a float stddev aggregate would not
    * be. Two jobs: the integer-stats aggregation, then a counting
    * rescan with the tiny stats broadcast.
    */
  def anomalyCheck(
      table: String, column: String, groupCol: String,
      zThreshold: Double = 3.0, maxOutlierPct: Double = 5.0): DataQualityCheck =
    DataQualityCheck(s"anomaly_${table}_$column", CheckTiming.AfterPipeline, { spark =>
      val cents = spark.table(table)
        .select(col(groupCol).as("g"),
          floor(col(column) * 100.0 + 0.5).cast("long").as("cents"))
      val mean = col("s").cast("double") / col("n").cast("double")
      val variance = col("q").cast("double") / col("n").cast("double") - mean * mean
      // zero-variance guard: a constant or single-row group would give
      // z = 0/0 = NaN and silently fall out of the |z| comparison. The
      // stats keep only groups with a defined z (n > 1, variance > 0);
      // the LEFT join leaves other groups' rows in `total` with a null
      // z — by definition not outliers, but still scanned rows.
      val stats = cents.groupBy(col("g")).agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("s"),
          sum(col("cents") * col("cents")).as("q"))
        .filter(col("n") > 1L && variance > 0.0)
      val row = cents.join(broadcast(stats), Seq("g"), "left")
        .select(((col("cents").cast("double") - mean) / sqrt(variance)).as("z"))
        .agg(
          sum(when(abs(col("z")) > zThreshold, 1L).otherwise(0L)).as("outliers"),
          count(lit(1)).as("total")).head()
      val outliers = Option(row.getAs[Any]("outliers")).fold(0L)(_.asInstanceOf[Long])
      val total = row.getAs[Long]("total")
      val pct = if (total == 0) 0.0 else outliers.toDouble * 100.0 / total
      CheckResult(s"anomaly_${table}_$column",
        pct <= maxOutlierPct,
        f"$table.$column: $outliers outliers of $total (|z|>$zThreshold%.1f, $pct%.3f%%, max $maxOutlierPct%.1f%%)",
        Map("outlier_pct" -> pct, "outliers" -> outliers.toDouble))
    })

  /** Arbitrary SQL returning a row with `passed: Boolean` (+ optional
    * `message`) (checks.py:258-308).
    */
  def customSqlCheck(name: String, sql: String): DataQualityCheck =
    DataQualityCheck(name, CheckTiming.AfterPipeline, { spark =>
      val row = spark.sql(sql).head()
      val passed = row.getAs[Boolean]("passed")
      val message =
        if (row.schema.fieldNames.contains("message"))
          Option(row.getAs[String]("message")).getOrElse("")
        else s"$name: passed=$passed"
      CheckResult(name, passed, message)
    })
}
