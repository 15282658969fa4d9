package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}

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
  * ArrayType (map explodes emit two attrs), a deterministic
  * subquery-free predicate, and predicate references ⊆ {the generated
  * attribute}. Conjuncts that also touch child columns stay in a
  * residual Filter above.
  *
  * POSEXPLODE (non-outer, array) is also covered, for predicates on the
  * VALUE attribute only: filtering the raw array would renumber `pos`,
  * so the rewrite tags elements with their original index first —
  *
  *   Filter(p(col), Generate(PosExplode(arr), …, [pos, col]))
  *     ⇒ Project(child…, se.pos AS pos, se.v AS col,
  *         Generate(Explode(
  *           filter(transform(arr, (x, i) → struct(i, x)), s → p(s.v))), …, se))
  *
  * — element-wise struct tagging is position-faithful, the filter drops
  * exactly the elements whose value fails p, and the Project restores
  * the original output attributes (same exprIds), so the row multiset,
  * order, and `pos` values are identical to filtering after explosion.
  * Conjuncts that reference `pos` itself stay in the residual Filter
  * (pushing them would be sound too, but a pos-predicate is a slice, not
  * a per-element probe — not the shape this rule targets).
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

    case f @ Filter(cond,
        g @ Generate(PosExplode(arr), _, false, _, genOut, _))
        if genOut.size == 2 && arr.dataType.isInstanceOf[ArrayType] =>
      val Seq(posAttr, colAttr) = genOut
      val (candidates, nonDetTail) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, residualDet) = candidates.partition(p =>
        p.references.nonEmpty &&
          p.references.subsetOf(AttributeSet(colAttr)) &&
          !SubqueryExpression.hasSubquery(p))
      val residual = residualDet ++ nonDetTail
      if (pushable.isEmpty) f
      else {
        val elemType = arr.dataType.asInstanceOf[ArrayType]
        val structType = StructType(Seq(
          StructField("pos", IntegerType, nullable = false),
          StructField("v", elemType.elementType, elemType.containsNull)))
        // tag every element with its ORIGINAL index, then filter structs
        val xv = NamedLambdaVariable("x", elemType.elementType,
          elemType.containsNull)
        val iv = NamedLambdaVariable("i", IntegerType, nullable = false)
        val tagged = ArrayTransform(arr, LambdaFunction(
          CreateNamedStruct(Seq(
            Literal("pos"), iv, Literal("v"), xv)), Seq(xv, iv)))
        val sv = NamedLambdaVariable("s", structType, nullable = false)
        val pred = pushable.reduce(And).transform {
          case a: Attribute if a.exprId == colAttr.exprId =>
            GetStructField(sv, 1, Some("v"))
        }
        val filtered = ArrayFilter(tagged, LambdaFunction(pred, Seq(sv)))
        val se = AttributeReference("se", structType, nullable = false)()
        val newGen = g.copy(generator = Explode(filtered),
          generatorOutput = Seq(se))
        // restore the original (pos, col) attributes — same exprIds, so
        // everything above the old Filter resolves unchanged
        val restore = Project(newGen.requiredChildOutput ++ Seq(
          Alias(GetStructField(se, 0, Some("pos")), posAttr.name)(
            posAttr.exprId, posAttr.qualifier),
          Alias(GetStructField(se, 1, Some("v")), colAttr.name)(
            colAttr.exprId, colAttr.qualifier)), newGen)
        if (residual.isEmpty) restore
        else Filter(residual.reduce(And), restore)
      }
  }
}
