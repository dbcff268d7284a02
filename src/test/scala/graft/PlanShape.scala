package graft

/** Plan-string analysis shared by the scale-shape guards: finds
  * Window nodes that would materialize one reducer per value of a
  * LOW-CARDINALITY key at 100 TB (one sorted partition per `source`
  * — the dominant crawl source on a single task).
  *
  * A window is flagged when ALL hold:
  *   - its partition spec's attributes are a subset of {`key`} — the
  *     raw skewed key alone, or a global window; a spec that also
  *     carries a bucket column (`source, __psb`) spreads the key and
  *     is fine, as is a spec on some OTHER (high-cardinality) key;
  *   - its IMMEDIATE input stage is not an aggregate: the only
  *     legitimate per-key window is the prefix-sum's offsets step,
  *     whose input is the bounded (key, bucket) census — reached
  *     through narrow unary wrappers only (Sort/Exchange/AQE reads/
  *     Project/Filter). An aggregate merely SOMEWHERE below the
  *     window (the old rule) is not enough: a window over a join of
  *     raw rows with some unrelated aggregate is still unbounded.
  *     A `ReusedExchange` leaf (the census exchange deduplicated by
  *     ReuseExchange) hides its subtree from the walk; it is exempt
  *     only when the window itself carries the census's `__psb`
  *     column — the kernel's own offsets signature.
  *
  * String-tree based (the PlanSpec idiom — typed traversal stops at
  * the AQE boundary, the plan text does not).
  */
object PlanShape {

  private def indentOf(line: String): Int =
    line.indexWhere(c => !" :+-".contains(c))

  /** Top-level `[...]` groups of a node line. */
  private def bracketGroups(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    var start = -1
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '[' =>
          if (depth == 0) start = i + 1
          depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i); start = -1 }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** Split a spec on commas outside any nesting. */
  private def topLevelSplit(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 =>
        val t = cur.result().trim; if (t.nonEmpty) out += t; cur.clear()
      case c => cur += c
    }
    val t = cur.result().trim; if (t.nonEmpty) out += t
    out.result()
  }

  private val AggregateNodes =
    Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate")

  /** Narrow unary wrappers a window's input legitimately routes
    * through between the window and its real input stage. Joins,
    * generates, unions — anything that can re-widen the input back
    * to raw rows — are NOT here, so the walk stops at them.
    */
  private val InputWrappers =
    Seq("Sort ", "Sort\t", "Exchange ", "AQEShuffleRead", "ShuffleQueryStage",
      "InputAdapter", "Project ", "Project[", "Filter ", "Coalesce",
      "ColumnarToRow")

  private def strip(line: String): String = {
    val ind = indentOf(line)
    if (ind < 0) "" else line.drop(ind).replaceFirst("^\\*\\(\\d+\\) ", "")
  }

  /** The node the window actually consumes: walk the first-child
    * chain through narrow unary wrappers; the first non-wrapper node
    * is the input stage.
    */
  private def immediateInput(lines: Vector[String], winIdx: Int): Option[String] = {
    var i = winIdx + 1
    var prevIndent = indentOf(lines(winIdx))
    while (i < lines.length) {
      val ind = indentOf(lines(i))
      if (ind <= prevIndent) return None // subtree ended
      val content = strip(lines(i))
      if (!InputWrappers.exists(content.startsWith)) return Some(content)
      prevIndent = ind
      i += 1
    }
    None
  }

  /** The Window node lines whose partition spec is ⊆ {`key`} over
    * raw (non-census) input — the single-reducer-per-key scale
    * killer for a low-cardinality `key`. Empty for a correctly
    * bucketed prefix-sum plan. `key` is the attribute name as it
    * appears in the plan (matched as `key#<exprId>`).
    */
  def unboundedWindowsOn(plan: String, key: String): Seq[String] = {
    val lines = plan.linesIterator.toVector
    val keyAttr = (key + "#\\d+L?$").r
    lines.indices.flatMap { i =>
      val content = strip(lines(i))
      if (!content.startsWith("Window ")) None
      else {
        val groups = bracketGroups(content)
        val partCols =
          if (groups.length >= 3) topLevelSplit(groups(groups.length - 2))
          else Vector.empty
        val onlyKey =
          partCols.forall(c => keyAttr.findFirstIn(c).isDefined)
        if (!onlyKey) None
        else {
          val input = immediateInput(lines, i)
          val censusInput =
            input.exists(in => AggregateNodes.exists(in.startsWith)) ||
              (input.exists(_.startsWith("ReusedExchange")) &&
                content.contains("__psb"))
          if (censusInput) None else Some(content)
        }
      }
    }
  }
}
