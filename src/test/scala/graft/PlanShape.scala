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
  *   - no aggregate sits below it in the plan (an aggregate child
  *     means the window's input is a bounded census — the offsets
  *     step of the distributed prefix-sum — not the raw rows).
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
      val line = lines(i)
      val ind = indentOf(line)
      if (ind < 0) None
      else {
        val content = line.drop(ind).replaceFirst("^\\*\\(\\d+\\) ", "")
        if (!content.startsWith("Window ")) None
        else {
          val groups = bracketGroups(content)
          val partCols =
            if (groups.length >= 3) topLevelSplit(groups(groups.length - 2))
            else Vector.empty
          val onlyKey =
            partCols.forall(c => keyAttr.findFirstIn(c).isDefined)
          val subtree = lines.drop(i + 1).takeWhile { l =>
            val li = indentOf(l); li > ind
          }
          val hasCensusBelow =
            subtree.exists(l => AggregateNodes.exists(l.contains))
          if (onlyKey && !hasCensusBelow) Some(content) else None
        }
      }
    }
  }
}
