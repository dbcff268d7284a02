package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Optimizer rule: bound edit-distance predicates with a free length
  * guard (SURVEY.md §2.2 sql-entry row).
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per row; but
  * `abs(length(a) - length(b))` is a LOWER bound on edit distance
  * (each length-difference char needs at least one edit), so
  * prepending `abs(length(a) - length(b)) <= k` rejects most
  * candidate pairs at O(1) without changing any result. Users write
  * the natural predicate; the rule injects the guard wherever the
  * pattern appears (filters, join residuals) — the kind of rewrite an
  * engine should do so query authors don't have to know the trick.
  *
  * Soundness: guard false ⇒ |len(a)−len(b)| > k ⇒ levenshtein ≥
  * |len(a)−len(b)| > k ⇒ original predicate false. `And` short-
  * circuits left-to-right in codegen, so the DP never runs on
  * guard-rejected rows. Null semantics are unchanged: if either input
  * is null, both guard and original evaluate to null, and
  * null AND null = null = original.
  *
  * The TreeNodeTag stops the optimizer's fixpoint loop from wrapping
  * the (still-matching) inner predicate again.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private val guarded = TreeNodeTag[Boolean]("graft.levenshteinGuarded")

  private def bound(cmp: BinaryComparison): Option[(Levenshtein, Expression)] =
    cmp match {
      case LessThanOrEqual(l: Levenshtein, r) => Some((l, r))
      case LessThan(l: Levenshtein, r) => Some((l, r))
      case GreaterThanOrEqual(r, l: Levenshtein) => Some((l, r))
      case GreaterThan(r, l: Levenshtein) => Some((l, r))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // threshold.isEmpty: the 3-arg levenshtein(a, b, t) form returns
      // -1 (not the distance) when the distance exceeds t, so
      // `levenshtein(a, b, t) <= k` can be TRUE where the length guard
      // is false — guarding it would drop rows. Only the unthresholded
      // form satisfies `result >= |len(a) - len(b)|`.
      // cmp.deterministic: the bound k is duplicated into the guard and
      // evaluated twice; a non-deterministic bound would disagree with
      // itself between the two evaluations.
      case cmp: BinaryComparison if bound(cmp).isDefined &&
          cmp.getTagValue(guarded).isEmpty &&
          bound(cmp).get._1.threshold.isEmpty &&
          cmp.deterministic =>
        val (lev, k) = bound(cmp).get
        cmp.setTagValue(guarded, true)
        val lenDiff = Abs(Subtract(Length(lev.left), Length(lev.right)))
        And(LessThanOrEqual(lenDiff, k), cmp)
    }
}
