package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.ops.TextAnalysis.{PiiEmail, PiiIp, PiiPhone, PiiUrl}

/** Optimizer rule: collapse `pii_redact(pii_redact(x))` → `pii_redact(x)`.
  *
  * The library ships `pii_redact` as an expression MACRO (it expands to a
  * four-stage native RegExpReplace chain at resolution time —
  * [[graft.functions.GraftFunctions.piiRedact]]), so Catalyst's built-in
  * simplifications know nothing about its algebra. Redaction is
  * IDEMPOTENT — every replacement token (`<URL>`, `<EMAIL>`, `<IP>`,
  * `<PHONE>`) is a fixed point of all four patterns (spec-pinned by a
  * property test, which is what licenses this rewrite as
  * semantics-preserving) — and composed pipelines double-redact easily:
  * a gate stage redacts, then a generic cleaning component redacts
  * again. Each collapsed chain saves four full regex passes per row,
  * which at 100 TB is the difference between one and two scans' worth of
  * regex CPU.
  *
  * The rule recognizes the exact expanded chain (patterns AND
  * replacement tokens, in order) and strips outer copies; a fixed-point
  * run collapses any depth. Registered via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`) for
  * config-built sessions and via `spark.experimental.extraOptimizations`
  * in [[graft.functions.GraftFunctions.register]] for live ones.
  */
object CollapseRedundantRedaction extends Rule[LogicalPlan] {

  /** Stages innermost-first, as [[graft.functions.GraftFunctions]]
    * builds them: url, email, ip, phone (phone is the OUTERMOST node).
    */
  private val Stages = Seq(
    PiiUrl -> "<URL>", PiiEmail -> "<EMAIL>",
    PiiIp -> "<IP>", PiiPhone -> "<PHONE>")

  private def isLit(e: Expression, s: String): Boolean = e match {
    case Literal(v, StringType) => v != null && v.toString == s
    case _ => false
  }

  /** If `e` is exactly the expanded redaction chain, return its input. */
  private def stripChain(e: Expression): Option[Expression] = {
    var cur = e
    // walk outermost (phone) to innermost (url)
    Stages.reverse.foreach { case (pat, tok) =>
      cur match {
        case RegExpReplace(child, p, r, _)
            if isLit(p, pat) && isLit(r, tok) =>
          cur = child
        case _ => return None
      }
    }
    Some(cur)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e =>
      stripChain(e) match {
        // e = chain(inner) where inner is itself a chain → the outer
        // application is redundant; fixed-point iteration handles
        // deeper nestings
        case Some(inner) if stripChain(inner).isDefined => inner
        case _ => e
      }
  }
}
