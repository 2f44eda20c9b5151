package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThanOrEqual,
  LeafExpression, LessThanOrEqual, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StructType}

/** SQL surface for the native as-of join (the last unused
  * `GraftExtensions` hook — `injectParser`):
  *
  * {{{
  *   SELECT ... FROM trades t ASOF JOIN quotes q
  *   ON t.sym = q.sym AND t.ts >= q.ts
  * }}}
  *
  * plans [[AsOfJoinExec]] — DuckDB's ASOF JOIN grammar, with graft's
  * left-asof semantics (every left row survives; unmatched rows carry
  * nulls — the Dataset API's `AsOf.joinBackward` contract).
  *
  * Mechanics: the injected parser rewrites `ASOF JOIN ... ON <cond>` to
  * `JOIN ... ON graft_asof_marker() AND <cond>` (a token-level scan that
  * respects quoting, not a regex over string bodies), the marker being
  * an unevaluable boolean leaf registered as a SQL function. A
  * resolution rule then lifts marked joins into [[AsOfJoin]]: equality
  * conjuncts become `by` keys and the single `l >= r` / `r <= l` time
  * conjunct becomes the backward as-of pair. The marker can never
  * execute: any marked join the rule cannot lift fails analysis loudly.
  *
  * Restrictions (documented, analyzer-enforced): the ON clause must be
  * a conjunction of equalities plus exactly one >=/<= time comparison;
  * the right side's `by` columns are not re-exposed (they equal the
  * left's); `USING` syntax is not supported.
  */
case class AsOfMarker() extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def sql: String = "graft_asof_marker()"
}

/** `ASOF JOIN ... ON` → `JOIN ... ON graft_asof_marker() AND`, skipping
  * quoted runs ('...', "...", `...`).
  *
  * The marker must land on the ON belonging to THIS join, so the scan
  * tracks parenthesis depth: an `ASOF JOIN` seen at depth d only
  * consumes an ON at depth d — the ONs of joins inside a parenthesized
  * subquery right side (`a ASOF JOIN (SELECT ... FROM b JOIN c ON ...)
  * q ON ...`) are at deeper depth and pass through untouched. Nested
  * as-ofs stack (inner, deeper ones resolve first). An ASOF JOIN whose
  * ON never arrives at its depth — end of statement, or its subtree
  * closes first (e.g. USING syntax, which is unsupported) — fails the
  * parse loudly instead of emitting unmarked SQL that would silently
  * run as a plain join. */
object AsOfSqlRewrite {
  private def parseError(msg: String): Nothing =
    throw org.apache.spark.sql.GraftSqlBridge.analysisException(s"ASOF JOIN: $msg")

  def apply(sql: String): String = {
    if (!sql.toLowerCase.contains("asof")) return sql
    val out = new StringBuilder(sql.length + 64)
    val n = sql.length
    var i = 0
    var depth = 0
    // depths of ASOF JOINs still awaiting their ON, innermost on top
    var pending = List.empty[Int]
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        // skip the quoted run honoring BOTH escape forms Spark's lexer
        // accepts: backslash escapes ('O\'Brien (', default non-ANSI
        // mode) and doubled quotes ('O''Brien'). Without this, a
        // literal's escaped quote ends the run early and any bracket in
        // the remainder corrupts the depth tracking — turning a valid
        // statement into a spurious "no ON clause" parse failure.
        out.append(c); i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = sql.charAt(i)
          if (ch == '\\' && c != '`' && i + 1 < n) {
            out.append(ch).append(sql.charAt(i + 1)); i += 2
          } else if (ch == c && i + 1 < n && sql.charAt(i + 1) == c) {
            out.append(ch).append(c); i += 2
          } else if (ch == c) {
            out.append(ch); i += 1; closed = true
          } else {
            out.append(ch); i += 1
          }
        }
      } else if (c == '(') {
        depth += 1; out.append(c); i += 1
      } else if (c == ')') {
        depth -= 1
        if (pending.headOption.exists(_ > depth))
          parseError("no ON clause found for ASOF JOIN before its subtree closed " +
            "(USING syntax is not supported)")
        out.append(c); i += 1
      } else if (isWordChar(c)) {
        val start = i
        while (i < n && isWordChar(sql.charAt(i))) i += 1
        val word = sql.substring(start, i)
        if (word.equalsIgnoreCase("ASOF")) {
          var j = i
          while (j < n && sql.charAt(j).isWhitespace) j += 1
          var k = j
          while (k < n && isWordChar(sql.charAt(k))) k += 1
          if (sql.substring(j, k).equalsIgnoreCase("JOIN")) {
            out.append("JOIN")
            i = k
            pending ::= depth
          } else out.append(word)
        } else if (word.equalsIgnoreCase("ON") && pending.headOption.contains(depth)) {
          out.append("ON graft_asof_marker() AND")
          pending = pending.tail
        } else out.append(word)
      } else { out.append(c); i += 1 }
    }
    if (pending.nonEmpty)
      parseError("no ON clause found for ASOF JOIN (USING syntax is not supported)")
    out.toString
  }
}

/** Delegating parser applying [[AsOfSqlRewrite]] to plan-level SQL. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsOfSqlRewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsOfSqlRewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Lifts marker-tagged joins into [[AsOfJoin]] once both sides and the
  * condition are resolved. */
object ResolveAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(msg: String): Nothing =
    throw org.apache.spark.sql.GraftSqlBridge.analysisException(
      s"ASOF JOIN: $msg (supported ON form: conjunction of left=right " +
        "equalities plus exactly one leftTime >= rightTime comparison)")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case j @ Join(l, r, joinType, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsOfMarker]) &&
          l.resolved && r.resolved && cond.resolved =>
      if (joinType != Inner && joinType != LeftOuter)
        fail(s"unsupported join type ${joinType.sql}")
      val conjuncts = splitConjunctivePredicates(cond)
      val rest = conjuncts.filterNot(_.isInstanceOf[AsOfMarker])
      val lset = l.outputSet
      val rset = r.outputSet
      def side(e: Expression): Option[Boolean] =
        if (e.references.subsetOf(lset)) Some(true)
        else if (e.references.subsetOf(rset)) Some(false)
        else None
      var byL = Vector.empty[Expression]
      var byR = Vector.empty[Expression]
      var times = Option.empty[(Expression, Expression)]
      def setTimes(lt: Expression, rt: Expression): Unit = {
        if (times.isDefined) fail("more than one time comparison")
        times = Some((lt, rt))
      }
      rest.foreach {
        case EqualTo(a, b) => (side(a), side(b)) match {
          case (Some(true), Some(false)) => byL :+= a; byR :+= b
          case (Some(false), Some(true)) => byL :+= b; byR :+= a
          case _ => fail(s"equality does not span the two sides: ${a.sql} = ${b.sql}")
        }
        case GreaterThanOrEqual(a, b) if side(a).contains(true) && side(b).contains(false) =>
          setTimes(a, b)
        case LessThanOrEqual(a, b) if side(a).contains(false) && side(b).contains(true) =>
          setTimes(b, a)
        case other => fail(s"unsupported conjunct ${other.sql}")
      }
      val (lt, rt) = times.getOrElse(fail("no time comparison found"))
      val asof = AsOfJoin(l, r, lt, rt, byL, byR, None)
      // AsOfJoin drops the right `by` attributes (equi-matched, so
      // redundant) — but `SELECT *` or explicit `q.sym` references may
      // already bind to them. Re-expose each as an alias of its left
      // twin under the ORIGINAL exprId, preserving the plain join's
      // output schema exactly (for unmatched left rows the by value is
      // the left key — pandas merge_asof behavior).
      val aliasBack = byR.zip(byL).collect {
        case (ra: AttributeReference, le) => ra.exprId -> ((ra, le))
      }.toMap
      val projList = j.output.map {
        case a: Attribute if aliasBack.contains(a.exprId) =>
          val (ra, le) = aliasBack(a.exprId)
          Alias(le, ra.name)(ra.exprId, ra.qualifier)
        case a => a
      }
      Project(projList, asof)
  }
}
