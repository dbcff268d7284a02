package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: lift a redundant GLOBAL sort into the window's
  * ORDER BY (SURVEY.md §2.2 q_lateral / sql-entry rows).
  *
  * Catalyst decorrelates a correlated `LATERAL (... ORDER BY o
  * LIMIT k)` subquery into
  *
  *   Filter (rn <= k)
  *   +- Window [row_number() over (partition by key)]   -- NO order
  *      +- Project ...
  *         +- Sort [o], global=true                     -- ALL rows
  *
  * — the per-partition ordering is inherited from a GLOBAL sort of
  * the inner table, which (a) range-shuffles every row through a
  * total order (the classic 100×-scale killer: one ordering funnel
  * for data that only needs per-key order), and (b) leaves a
  * rank-like window with no ORDER BY, which the engine's
  * InferWindowGroupLimit optimization cannot act on.
  *
  * The rewrite moves the sort keys INTO the window specification and
  * deletes the global Sort:
  *
  *   Filter (rn <= k)
  *   +- Window [row_number() over (partition by key ORDER BY o)]
  *      +- Project ...                                  -- no Sort
  *
  * which is the plan a user writing the window form by hand gets —
  * one hash shuffle on the partition key, per-partition local sort,
  * and the downstream rank filter now triggers WindowGroupLimit
  * (map-side top-k before the shuffle). Users keep the natural
  * LATERAL spelling; the engine plans it like a window top-k.
  *
  * Soundness: row_number() with an empty window ORDER BY numbers
  * rows in their incoming partition order, which this plan shape
  * derives solely from the global sort below (modulo exchange
  * nondeterminism — the rewrite actually STRENGTHENS determinism by
  * making the per-partition order explicit). Restricted to:
  * row_number windows with empty orderSpec, whose child is a global
  * Sort under a (possibly empty) chain of Projects, with
  * attribute-only sort keys. Intermediate Projects are widened to
  * keep the sort-key attributes in scope for the window; when any
  * widening happened, the rewritten Window is wrapped in a
  * `Project(w.output, ...)` so the subtree's output schema is
  * byte-for-byte the original — the rule runs session-wide after
  * column pruning, and an arity/position-sensitive parent (Union)
  * or a missing pruning Project above must not observe extra
  * columns.
  */
object WindowOrderLift extends Rule[LogicalPlan] {

  private def rowNumberNoOrder(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber,
      WindowSpecDefinition(_, Nil, _)), _) => true
    case _ => false
  }

  /** The global Sort under a chain of Projects, outermost Project
    * first.
    */
  private def sortBelow(p: LogicalPlan,
      projs: List[Project]): Option[(Sort, List[Project])] = p match {
    case pr: Project => sortBelow(pr.child, projs :+ pr)
    case s: Sort if s.global => Some((s, projs))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(winExprs, _, Nil, child, _)
        if winExprs.nonEmpty && winExprs.forall(rowNumberNoOrder) =>
      sortBelow(child, Nil) match {
        case Some((sort, projs))
            if sort.order.forall(_.child.isInstanceOf[AttributeReference]) =>
          val sortAttrs = sort.order.map(_.child.asInstanceOf[AttributeReference])
          // rebuild the Project chain innermost-first over the Sort's
          // child, each widened with any missing sort-key attributes
          var widened = false
          val newChild = projs.foldRight(sort.child) { (pr, acc) =>
            val missing = sortAttrs.filterNot(pr.outputSet.contains)
            if (missing.nonEmpty) widened = true
            Project(pr.projectList ++ missing, acc)
          }
          val newWinExprs = winExprs.map {
            case a @ Alias(we @ WindowExpression(_,
                spec @ WindowSpecDefinition(_, Nil, _)), name) =>
              Alias(we.copy(windowSpec = spec.copy(orderSpec = sort.order)),
                name)(a.exprId, a.qualifier, a.explicitMetadata,
                a.nonInheritableMetadataKeys)
            case other => other
          }
          val newWindow = w.copy(windowExpressions = newWinExprs,
            orderSpec = sort.order, child = newChild)
          // restore the original output schema if widening leaked
          // sort-key columns into the Window's child output
          if (widened) Project(w.output, newWindow) else newWindow
        case _ => w
      }
  }
}
