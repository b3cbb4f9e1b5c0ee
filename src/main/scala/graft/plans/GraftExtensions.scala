package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.PredicateHelper

/** Pushes doc_id-only predicates through [[ExtractDocs]] down to its child.
  *
  * The node computes fresh output attributes, so Catalyst's own
  * PushDownPredicates cannot know any column passes through — but extraction
  * preserves doc_id verbatim (output doc_id == input doc_id), so a predicate
  * on the output doc_id is exactly a predicate on the input doc_id. Rewriting
  * it below the node lands it directly above the parquet relation, where
  * FileSourceStrategy turns it into PushedFilters + partition pruning:
  * "extract one doc of 10^12" becomes a pruned scan instead of a full parse.
  */
object PushDocIdFilterThroughExtract extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, e: ExtractDocs) if e.resolved =>
      (e.output.find(_.name == "doc_id"), e.child.output.find(_.name == "doc_id")) match {
        case (Some(outId), Some(inId)) =>
          val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
            p.deterministic && p.references.subsetOf(AttributeSet(outId)))
          if (push.isEmpty) f
          else {
            val rewritten = push
              .map(_.transform { case a: Attribute if a.exprId == outId.exprId => inId })
              .reduce(And)
            val extracted = e.withNewChildren(Seq(Filter(rewritten, e.child)))
            keep.reduceOption(And).map(Filter(_, extracted)).getOrElse(extracted)
          }
        case _ => f
      }
  }
}

/** The single spark-submit registration point for everything this library
  * adds to a session — the extraction strategy, the pushdown rule, and the
  * `fix_typos`/`simhash64` SQL functions:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * [[ExtractDocs.over]] / [[graft.functions.Functions.register]] install the
  * same pieces at runtime for sessions built without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => ExtractStrategy)
    ext.injectOptimizerRule(_ => PushDocIdFilterThroughExtract)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fix_typos"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.FixTyposExpr].getName, "fix_typos"),
      exprs => graft.functions.FixTyposExpr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SimHash64Expr].getName, "simhash64"),
      exprs => graft.functions.SimHash64Expr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.NfcNormalizeExpr].getName, "nfc_normalize"),
      exprs => graft.functions.NfcNormalizeExpr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fix_mojibake"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.FixMojibakeExpr].getName, "fix_mojibake"),
      exprs => graft.functions.FixMojibakeExpr(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("log_prob_micro"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.LogProbMicroExpr].getName, "log_prob_micro"),
      exprs => graft.functions.LogProbMicroExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("entropy_term_micro"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.EntropyTermMicroExpr].getName, "entropy_term_micro"),
      exprs => graft.functions.EntropyTermMicroExpr(exprs(0), exprs(1))))
  }
}
