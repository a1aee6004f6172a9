package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Join, JoinHint, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Standard-SQL semantics for the empty grouping set over empty input —
  * a divergence the differential SQL fuzz (tools.FuzzSql) caught on its
  * first extended run: `GROUP BY ROLLUP(a, b)` over a filtered-empty
  * relation returns the grand-total row (count = 0, other aggregates
  * NULL) in DuckDB — the reference's dialect — and per ISO SQL, because
  * the `()` grouping set aggregates the whole (empty) input exactly like
  * a global aggregate does. Spark expands grouping sets into an
  * `Expand` + hash aggregate keyed by `spark_grouping_id`, so an empty
  * input produces no groups at all and the row is lost.
  *
  * The rewrite is SINGLE-PASS — at 100 TB the obvious fix (UNION ALL a
  * separate global aggregate) would scan the input twice:
  *
  * {{{
  *   Aggregate(gid…, Expand(child))                      // original
  *   ⇒ Project(if(isnull(marker), defaults, out)…,
  *       Join(OneRowRelation, Aggregate(… :+ marker), LeftOuter))
  * }}}
  *
  * The one-row left side broadcasts for free; when the aggregate is
  * non-empty the marker is set and every row passes through untouched,
  * and when it is empty the left-outer join null-extends to exactly one
  * row whose columns are rebuilt from the GLOBAL projection of the
  * Expand: grouping columns → NULL literals, `spark_grouping_id` → its
  * all-excluded literal (so `grouping()`/`grouping_id()` expressions
  * stay correct), aggregate functions → `defaultResult` (Count → 0,
  * standard aggregates → NULL — DuckDB's and the standard's empty-input
  * values).
  *
  * Fires only on grouping-sets aggregates that contain exactly one
  * global set (ROLLUP, CUBE, and GROUPING SETS listing `()` once);
  * plain GROUP BY and grouping sets without `()` are standard-correct
  * in Spark already. Idempotent under the optimizer's fixed-point batch
  * via the marker guard. Installed per-session (no extensions wiring
  * needed) through `spark.experimental.extraOptimizations` by
  * [[EmptyGroupingSetsRule.install]]; `functions.Dialect.register` and
  * `Lake` both call it.
  */
object EmptyGroupingSetsRule extends Rule[LogicalPlan] {

  private val MarkerName = "__graft_nonempty"
  private val GroupingIdName = "spark_grouping_id"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if eligible(agg) => rewrite(agg)
  }

  private def eligible(agg: Aggregate): Boolean = agg.child match {
    case expand: Expand =>
      !agg.isStreaming &&
        !agg.aggregateExpressions.exists(_.name == MarkerName) &&
        // the GENUINE grouping-sets shape, not an Expand some later
        // rewrite (RewriteDistinctAggregates) builds: the analyzer puts
        // spark_grouping_id LAST in the Expand output and gives it a
        // LITERAL per projection row — a distinct-rewrite Expand passes
        // the gid through as an attribute reference instead, and firing
        // on it would inject a bogus defaults row into a two-phase
        // distinct aggregation
        expand.output.lastOption.exists(_.name == GroupingIdName) &&
        expand.projections.forall(p =>
          p.lastOption.exists(_.isInstanceOf[Literal])) &&
        globalProjections(agg, expand).length == 1
    case _ => false
  }

  /** Projection rows of the global (`()`) grouping set: every grouping
    * position — the analyzer lays Expand output out as
    * `child.output ++ groupingAttrs :+ gid` — is a NULL literal. */
  private def globalProjections(agg: Aggregate,
      expand: Expand): Seq[Seq[Expression]] = {
    val nGroup = agg.groupingExpressions.length - 1 // minus gid
    val width = expand.output.length
    if (nGroup < 1 || width < nGroup + 1) return Nil
    val groupIdx = (width - 1 - nGroup) until (width - 1)
    expand.projections.filter(p => groupIdx.forall(i => p(i) match {
      case Literal(null, _) => true
      case _ => false
    }))
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    val expand = agg.child.asInstanceOf[Expand]
    val globalRow = globalProjections(agg, expand).head
    // expand-output attribute -> its value in the global grouping set:
    // NULL literals at grouping positions, the all-excluded literal at
    // gid, the raw child columns at aggregation-input positions (those
    // only occur inside aggregate functions, which are replaced whole)
    val sub: Map[Attribute, Expression] =
      expand.output.zip(globalRow).toMap
    def defaulted(e: Expression): Expression = e.transformUp {
      case ax: AggregateExpression =>
        ax.aggregateFunction.defaultResult
          .getOrElse(Literal.create(null, ax.dataType))
      case a: Attribute if sub.contains(a) => sub(a)
    }
    val marker = Alias(Literal(true), MarkerName)()
    val inner = agg.copy(
      aggregateExpressions = agg.aggregateExpressions :+ marker)
    val joined =
      Join(OneRowRelation(), inner, LeftOuter, None, JoinHint.NONE)
    val outExprs = agg.aggregateExpressions.zip(agg.output).map {
      case (ae, out) =>
        val bare = ae match { case Alias(c, _) => c; case x => x }
        Alias(If(IsNull(marker.toAttribute), defaulted(bare), out),
          out.name)(exprId = out.exprId, qualifier = out.qualifier)
    }
    Project(outExprs, joined)
  }

  /** Append to the session's user-provided optimizer batch, once.
    * That batch runs LAST, which covers runtime-empty inputs (file-backed
    * tables — the lake's shape) but misses two earlier-batch rewrites:
    * STATICALLY-empty plans (a constant-false predicate is folded by
    * PruneFilters and the aggregate collapsed by PropagateEmptyRelation
    * first), and MULTI-DISTINCT aggregates over grouping sets
    * (RewriteDistinctAggregates restructures them into
    * Aggregate-over-Aggregate before this batch, and the guard above
    * deliberately refuses the rewritten shape). SQL entry points close
    * both gaps with [[applyAnalyzed]], which runs before any optimizer
    * rewrite. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  /** Rewrite at the ANALYZED stage — before constant folding — so even
    * statically-empty inputs (`WHERE 1 = 0` under a ROLLUP) keep the
    * grand-total row. The marker guard keeps the optimizer-batch copy of
    * the rule from firing a second time on the same aggregate.
    *
    * Unlike the optimizer copy this DESCENDS INTO SUBQUERY-EXPRESSION
    * plans (an `IN (SELECT … GROUP BY ROLLUP …)` over empty input must
    * see the inner grand-total row too — the r9 advisor's residual gap),
    * but only into UNCORRELATED aggregates: injecting the LeftOuter-
    * under-OneRowRelation shape beneath an aggregate that carries
    * OuterReferences would hand the decorrelation rules a join they
    * never expect there. Correlated grouping-sets subqueries stay on
    * stock Spark semantics (documented in README "Dialect notes"
    * territory; the shape is exotic and DuckDB's own decorrelation also
    * bends ISO here). */
  def applyAnalyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val rewritten = analyzed.transformUpWithSubqueries {
      case agg: Aggregate if eligible(agg) && !hasOuterRefs(agg) =>
        rewrite(agg)
    }
    if (rewritten eq analyzed) df
    else org.apache.spark.sql.GraftBridge.ofRows(df.sparkSession, rewritten)
  }

  /** Any OuterReference anywhere in the aggregate's subtree marks a
    * correlated subquery body. */
  private def hasOuterRefs(agg: Aggregate): Boolean =
    agg.exists(_.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.OuterReference])))
}
