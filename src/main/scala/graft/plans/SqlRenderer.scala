package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}

/** Best-effort LogicalPlan -> SQL text for the rewritten-query subset
  * (SELECT / WHERE / JOIN / GROUP BY / ORDER BY / subqueries / INSERT).
  *
  * The reference's rewrite API returns SQL strings
  * (SecurityContext.java:126-167); Spark has no reliable plan->SQL printer,
  * so this renderer exists for human-readable diffing and golden-style
  * assertions — execution always uses the plan itself, never this text.
  */
object SqlRenderer {

  def toSql(plan: LogicalPlan): String = render(plan)

  private def exprSql(e: Expression): String = e match {
    case a: Alias => s"${exprSql(a.child)} AS ${quote(a.name)}"
    case ar: AttributeReference => quote(ar.name)
    case _ => e.sql
  }

  private def quote(name: String): String =
    if (name.matches("[a-zA-Z_][a-zA-Z0-9_]*")) name else s"`$name`"

  private def render(plan: LogicalPlan): String = plan match {
    case Sort(order, _, child, _) =>
      s"${render(child)} ORDER BY ${order.map(_.sql).mkString(", ")}"
    case GlobalLimit(n, LocalLimit(_, child)) =>
      s"${render(child)} LIMIT ${n.sql}"
    case Project(cols, child) =>
      s"SELECT ${cols.map(exprSql).mkString(", ")} FROM ${renderFrom(child)}"
    case Aggregate(group, agg, child, _) =>
      val g = if (group.isEmpty) "" else s" GROUP BY ${group.map(exprSql).mkString(", ")}"
      s"SELECT ${agg.map(exprSql).mkString(", ")} FROM ${renderFrom(child)}$g"
    case Filter(cond, child) =>
      s"SELECT * FROM ${renderFrom(child)} WHERE ${cond.sql}"
    case i: InsertIntoStatement =>
      val table = i.table match {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          r.multipartIdentifier.mkString(".")
        case other => tableName(other).getOrElse(other.nodeName)
      }
      s"INSERT INTO $table ${render(i.query)}"
    case other => s"SELECT * FROM ${renderFrom(other)}"
  }

  /** Renders a FROM-position subtree (relations, joins, aliased subqueries,
    * and the security layer's injected Filter/Project wrappers).
    */
  private def renderFrom(plan: LogicalPlan): String = plan match {
    case Join(left, right, joinType, cond, _) =>
      val jt = joinType match {
        case Inner => "JOIN"
        case LeftOuter => "LEFT JOIN"
        case RightOuter => "RIGHT JOIN"
        case FullOuter => "FULL JOIN"
        case other => s"${other.sql} JOIN"
      }
      val on = cond.map(c => s" ON ${c.sql}").getOrElse("")
      s"${renderFrom(left)} $jt ${renderFrom(right)}$on"
    case sa @ SubqueryAlias(id, child) =>
      child match {
        // plain table scan: name AS alias (alias dropped when identical)
        case base if tableName(base).isDefined =>
          val t = tableName(base).get
          if (t == id.name) t else s"$t AS ${quote(id.name)}"
        case _: View => id.name
        // security-injected wrappers render as a derived table
        case other => s"(${render(other)}) AS ${quote(id.name)}"
      }
    case v: View => v.desc.identifier.table
    case leaf: LeafNode => tableName(leaf).getOrElse(leaf.nodeName)
    case other => s"(${render(other)})"
  }

  private def tableName(plan: LogicalPlan): Option[String] = plan match {
    case v: View => Some(v.desc.identifier.table)
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      Some(r.multipartIdentifier.mkString("."))
    case _ => None
  }
}
