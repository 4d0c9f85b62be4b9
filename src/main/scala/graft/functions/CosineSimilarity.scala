package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order array functions are interpreted per element — measured
  * ~50× slower than compiled code on 64-dim vectors — while this
  * expression participates in whole-stage codegen: `doGenCode` emits a
  * primitive double loop straight into the generated stage, so a
  * scan→cosine→filter pipeline runs with zero boxing and no virtual
  * calls. This is preference order (b) from the build brief: a custom
  * scalar Expression, long before any custom physical operator.
  *
  * Numerics: three independent accumulators (dot, |a|², |b|²) folded
  * left-to-right, result = dot / (sqrt(na)·sqrt(nb)) — the same op
  * order as the engine's Column-level fold and the DuckDB oracle, so
  * all three agree bit-exactly.
  *
  * Null semantics: a null element in either vector makes the whole
  * result NULL (not silently 0.0 — getDouble on a null slot reads a
  * zeroed buffer), matching how null operands poison arithmetic
  * everywhere else in SQL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]);
  // validate the two array<double> inputs directly instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // Always nullable: a null ELEMENT nulls the result even when the array
  // columns themselves are non-nullable (and guarantees codegen gets a
  // mutable isNull slot rather than the literal `false`).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** (identifier, info, builder) triple — the shape SparkSessionExtensions
    * .injectFunction expects.
    */
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    { args =>
      require(args.length == 2, "cosine_sim expects exactly 2 arguments")
      CosineSimilarity(args.head, args(1))
    })

  /** `pii_redact(text)` as a SQL function — an EXPRESSION MACRO, not a
    * UDF: the builder expands to the same four-stage RegExpReplace
    * chain [[graft.ops.TextAnalysis.redactPii]] composes (shared
    * pattern constants, same order), so SQL-text pipelines
    * (`SqlTransform`, the reference's primary extension path) get the
    * codegen'd native chain with zero interpretation overhead — the
    * analyzer sees nested RegExpReplace nodes exactly as if the user
    * had written them out.
    */
  val piiRedact: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pii_redact"),
    new ExpressionInfo("graft.ops.TextAnalysis", "pii_redact"),
    { args =>
      require(args.length == 1, "pii_redact expects exactly 1 argument")
      import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
      import graft.ops.TextAnalysis._
      def rr(child: Expression, pat: String, tok: String): Expression =
        RegExpReplace(child, Literal(pat), Literal(tok))
      rr(rr(rr(rr(args.head, PiiUrl, "<URL>"),
        PiiEmail, "<EMAIL>"), PiiIp, "<IP>"), PiiPhone, "<PHONE>")
    })

  /** Idempotent runtime registration for sessions built without the
    * extensions config.
    */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    Seq(cosineSim, piiRedact).foreach { case (id, info, builder) =>
      if (!registry.functionExists(id))
        registry.registerFunction(id, info, builder)
    }
    // live-session counterpart of injectOptimizerRule (idempotent)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.CollapseRedundantRedaction))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.CollapseRedundantRedaction
  }
}

/** Session-extensions entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every
  * session (including Spark Connect server-side) gets the function
  * without touching driver code.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSim)
    ext.injectFunction(GraftFunctions.piiRedact)
    ext.injectOptimizerRule(_ => graft.plans.CollapseRedundantRedaction)
  }
}
