package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge

import graft.relational.BloomPrune

/** I16 — the OPTIMIZER-RULE leg of the extension ladder (I1/I2 cover
  * expressions, I12 covers planner strategies): a macro logical node
  * expanded by an injected `Rule[LogicalPlan]`.
  *
  * [[BloomSemiNode]] declares "Bloom-accelerated semi-join" as a single
  * logical operator; [[BloomSemiExpandRule]] — registered through
  * `injectPostHocResolutionRule` in [[graft.GraftExtensions]] — expands
  * it into the [[BloomPrune]] composition at the END of analysis.
  * Expanding post-analysis (rather than in an optimizer batch) means
  * the full optimizer still sees an ordinary plan: column pruning,
  * predicate pushdown, hint elimination, and join selection all apply
  * to the expansion, and nothing downstream ever needs to know the
  * macro node existed. This is the right altitude for operators that
  * are COMPOSITIONS of built-ins (vs I12's AsOfJoinExec, which earns a
  * physical operator because no composition expresses its O(n+m)
  * merge).
  */
case class BloomSemiNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    mBits: Int, k: Int) extends BinaryNode {
  // Semi-join semantics: output is exactly the left side's attributes,
  // so the expansion (which preserves the left attrs through its
  // projections) splices in without an exprId remap.
  override def output: Seq[Attribute] = left.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BloomSemiNode =
    copy(left = newLeft, right = newRight)
}

/** Expands [[BloomSemiNode]] into the prefilter + exact semi-join
  * composition. Runs once per query in the post-hoc resolution batch. */
case class BloomSemiExpandRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case BloomSemiNode(l, r, lk, rk, mBits, k) =>
      Bridge.analyzed(BloomPrune.semiJoin(
        Bridge.ofRows(spark, l), lk, Bridge.ofRows(spark, r), rk, mBits, k))
  }
}

/** DataFrame-level entrypoint for the macro node. */
object BloomSemi {
  def join(fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String,
           mBits: Int = 1 << 16, k: Int = 3): DataFrame =
    Bridge.ofRows(fact.sparkSession, BloomSemiNode(
      Bridge.analyzed(fact), Bridge.analyzed(dim),
      factKey, dimKey, mBits, k))
}
