package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan form of SchemaInference's per-value type
  * vote (r19 per-task-work optimization, guide §1.2 step 2): the
  * first-match CASE over five anchored `rlike`s ran up to five
  * java.util.regex matchers per CSV cell inside the inference agg —
  * the conversion family's second-hottest stage. This expression
  * classifies the cell in ONE scan of its bytes, bit-for-bit
  * equivalent to the regex chain:
  *
  *   `^(?i)(true|false)$`                        → BIT_BOOL  (2)
  *   `^-?(\d+\.\d+)$`                            → BIT_FLOAT (4)
  *   `^-?(\d+)$`                                 → BIT_INT   (8)
  *   `^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}$`  → BIT_DATE64(16)
  *   `^\d{4}-\d{2}-\d{2}$`                       → BIT_DATE32(32)
  *   otherwise                                   → BIT_UTF8  (64)
  *
  * Equivalence notes: Java `\d` is ASCII [0-9] (no UNICODE flag) and
  * `(?i)` without UNICODE_CASE folds ASCII only — both exactly the
  * byte tests below; any multi-byte UTF-8 cell fails every class and
  * lands on UTF8, as it does under the regexes. The numeric branch
  * orders int after float the way disjoint patterns allow (a string
  * cannot match both). Null cells are handled by the caller (the
  * CASE's isNull arm), matching the previous shape; the expression
  * itself is null-safe anyway. SchemaInferenceSpec pins the
  * semantics; the ref_* oracle entries gate the end-to-end result.
  */
object CsvTypeVote {
  // bit layout mirrors SchemaInference's
  private final val BOOL = 2L
  private final val FLOAT = 4L
  private final val INT = 8L
  private final val DATE64 = 16L
  private final val DATE32 = 32L
  private final val UTF8 = 64L

  private def digit(b: Byte): Boolean = b >= '0' && b <= '9'

  private def digits(a: Array[Byte], from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) { if (!digit(a(i))) return false; i += 1 }
    true
  }

  /** ASCII-case-insensitive equality against a lowercase literal. */
  private def asciiEqLower(a: Array[Byte], lit: String): Boolean = {
    if (a.length != lit.length) return false
    var i = 0
    while (i < a.length) {
      val c = (a(i) | 0x20).toChar
      if (c != lit.charAt(i)) return false
      i += 1
    }
    true
  }

  def bits(s: UTF8String): Long = {
    val a = s.getBytes
    val n = a.length
    if (asciiEqLower(a, "true") || asciiEqLower(a, "false")) return BOOL
    // numeric: optional '-', 1+ digits, then either end (INT) or a
    // single '.' and 1+ trailing digits (FLOAT)
    var i = 0
    if (n > 0 && a(0) == '-') i = 1
    val ds = i
    while (i < n && digit(a(i))) i += 1
    if (i > ds) {
      if (i == n) return INT
      if (a(i) == '.' && i + 1 < n && digits(a, i + 1, n)) return FLOAT
    }
    if (n == 19 && digits(a, 0, 4) && a(4) == '-' && digits(a, 5, 7) &&
      a(7) == '-' && digits(a, 8, 10) && (a(10) == 'T' || a(10) == ' ') &&
      digits(a, 11, 13) && a(13) == ':' && digits(a, 14, 16) &&
      a(16) == ':' && digits(a, 17, 19)) return DATE64
    if (n == 10 && digits(a, 0, 4) && a(4) == '-' && digits(a, 5, 7) &&
      a(7) == '-' && digits(a, 8, 10)) return DATE32
    UTF8
  }
}

case class CsvTypeVoteExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    CsvTypeVote.bits(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CsvTypeVote.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): CsvTypeVoteExpr =
    copy(child = newChild)
}
