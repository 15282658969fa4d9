package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Push a per-element predicate THROUGH an `explode`: rewrite
  *
  *   Filter(p(col), Generate(Explode(arr), …, col))
  *     ⇒ Generate(Explode(filter(arr, x → p(x))), …, col)
  *
  * Catalyst pushes filters through joins, aggregates, and projections,
  * but NOT through `Generate` when the predicate references the
  * GENERATED column — the filter runs on the exploded row stream, after
  * the row-explosion cost is already paid. For selective per-element
  * predicates over wide arrays (the `term IN (…)` probe over tokenized
  * documents in `Retrieval.bm25TopK`, any posting-list prefilter) the
  * rewrite evaluates the predicate inside the array BEFORE exploding,
  * so the generate emits only surviving elements — identical semantics,
  * strictly fewer generated rows.
  *
  * Soundness: for a non-outer array `Explode`,
  * `Filter(p(x), explode(arr))` keeps exactly the rows whose element
  * satisfies p (null-or-false drops the row), and
  * `explode(filter(arr, p))` emits exactly the elements satisfying p
  * (null-or-false drops the element) — the same multiset, in the same
  * order. The rewrite therefore requires: non-outer Explode of an
  * ArrayType (map explodes emit two attrs; posexplode renumbers `pos`),
  * a deterministic subquery-free predicate, and predicate references
  * ⊆ {the generated attribute}. Conjuncts that also touch child columns
  * stay in a residual Filter above.
  */
object PushPredicateThroughExplode extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        g @ Generate(Explode(arr), _, false, _, genOut, _))
        if genOut.size == 1 && arr.dataType.isInstanceOf[ArrayType] =>
      val out = genOut.head
      // Catalyst convention (PushPredicateThroughNonJoin): only conjuncts
      // BEFORE the first non-deterministic one may move — pushing a later
      // deterministic conjunct would change how many rows the
      // non-deterministic one evaluates on.
      val (candidates, nonDetTail) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, residualDet) = candidates.partition(p =>
        p.references.nonEmpty &&
          p.references.subsetOf(AttributeSet(out)) &&
          !SubqueryExpression.hasSubquery(p))
      val residual = residualDet ++ nonDetTail
      if (pushable.isEmpty) f
      else {
        val elemType = arr.dataType.asInstanceOf[ArrayType]
        val x = NamedLambdaVariable("x", elemType.elementType,
          elemType.containsNull)
        val pred = pushable.reduce(And).transform {
          case a: Attribute if a.exprId == out.exprId => x
        }
        val filtered = ArrayFilter(arr, LambdaFunction(pred, Seq(x)))
        val newGen = g.copy(generator = Explode(filtered))
        if (residual.isEmpty) newGen
        else Filter(residual.reduce(And), newGen)
      }
  }
}
