package graft.plans

import graft.policy.PolicyManager
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.Metadata

/** Plan-level equivalents of the reference's AST visitors.
  *
  * The reference rewrites SQL text between Calcite's validator and Flink's
  * planner (RowFilterVisitor.java:45-106, DataMaskVisitor.java:54-157). Here
  * the same semantics are Catalyst rules that inject `Filter` / `Project`
  * nodes directly above each policied base-table scan:
  *
  *   - RowFilterRule:  SubqueryAlias(t, scan)  ->  SubqueryAlias(t, Filter(cond, scan))
  *   - DataMaskRule:   SubqueryAlias(t, [Filter*,] scan)
  *                       ->  SubqueryAlias(t, [Filter*,] Project(maskedCols, scan))
  *
  * Masked columns get fresh exprIds and every reference above the scan is
  * rewritten to them (via `transformUpWithNewOutput`), so every operator above
  * — including a row filter injected first — transparently reads masked
  * values. That reproduces the reference's `mixedRewrite` composition where
  * the injected WHERE sits outside the mask subquery
  * (SecurityContext.java:154-167, MixedRewriteTest.java:101-134). (Re-using
  * the original exprIds instead is NOT safe: the masked Project's output then
  * equals its child's output and the optimizer's RemoveNoopOperators strips
  * the mask away.)
  *
  * Injected conditions/transformers are left unresolved; the caller re-runs
  * the analyzer (SecurityContext) or the surrounding analyzer fixed point
  * (extension mode) resolves names, functions and type coercion — this is
  * what replaces the reference's string re-parse round trip.
  *
  * Re-entrancy (the reference's javassist `custom` flag hack,
  * SecurityContext.java:67-90) is a plain TreeNodeTag here.
  *
  * Scale note: rules run once per query on the driver; the injected Filter
  * sits directly above the scan, so Catalyst pushes predicates into the
  * Parquet reader and prunes masked-but-unreferenced columns — at 100 TB the
  * security layer adds zero extra shuffles or passes.
  *
  * ENFORCEMENT BOUNDARY (pinned by GraftSecurityExtensionsSpec's adversarial
  * tests): policies attach to catalog table identifiers, exactly like the
  * reference (and Ranger/Hive). Inside that boundary, enforcement covers any
  * reference to the table — joins, subqueries, EXISTS, UNION legs, CTAS/INSERT
  * bodies — and new queries stay enforced even when a scan is answered from a
  * cache populated before the policy existed (the injected nodes sit above the
  * matched cache subtree). Outside it: a direct `spark.read.parquet(path)` of
  * the table's files never passes through a catalog identifier and is NOT
  * rewritten, and a DataFrame handle cached before a policy was added keeps
  * serving its materialized raw rows. Both are storage/lifecycle concerns the
  * engine cannot see — deployments must pair table policies with storage ACLs
  * denying raw-path access, the same split Ranger documents for Hive.
  */
object SecurityTags {
  val RowFilterApplied: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.rowFilterApplied")
  val MaskApplied: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.maskApplied")
  // audit breadcrumbs ("cat.db.table|detail") left at each injection site;
  // SecurityContext.auditLog collects them post-rewrite (the Ranger model:
  // every policy application is an auditable access decision)
  val RowFilterAudit: TreeNodeTag[String] = TreeNodeTag[String]("graft.rowFilterAudit")
  val MaskAudit: TreeNodeTag[String] = TreeNodeTag[String]("graft.maskAudit")
  // a DENY decision ([[graft.policy.DenyRowPolicy]]) — mechanically the same
  // injected `false` filter, but the audit trail must read it as the deny it
  // is, not as an ordinary allow-filter that happens to be `false`
  val RowDenyAudit: TreeNodeTag[String] = TreeNodeTag[String]("graft.rowDenyAudit")
}

/** Resolves which (catalog, database) a bare single-part table reference
  * belongs to, mirroring the reference's implicit hive.default qualification.
  */
final case class TableScope(catalog: String, database: String)

/** Plan-shape predicates shared by the security rules and [[SqlRenderer]] —
  * one list of "what counts as a base table", so the rules and the renderer
  * can never drift apart on it.
  */
object PlanShapes {
  /** A scan of a named table: the alias directly over a leaf relation or a
    * (temp) view. Derived tables have Project/Filter/... children and are
    * excluded — policies reach the tables inside them instead, exactly like
    * the reference's visitor (RowFilterVisitor.java:71-79).
    */
  def isBaseTable(p: LogicalPlan): Boolean = p match {
    case _: View => true // temp/SQL views (resolved by construction)
    case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
    case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
    case _: org.apache.spark.sql.catalyst.catalog.HiveTableRelation => true
    case l: LeafNode if l.nodeName.contains("StreamingRelation") => l.resolved
    // NOT a plain LeafNode match: `(VALUES ...) AS t` puts a LocalRelation
    // under the alias, and an inline alias must never collide with a policy
    // on a real table of the same name. Unresolved relations (also leaves)
    // must not match while the rules run inside the analyzer's fixed point.
    case _ => false
  }

  /** (catalog, db, table) of a SubqueryAlias identifier; empty qualifiers
    * get the scope's defaults, like Flink's validator qualifying bare names.
    * Shared by the rules (via [[SecurityRuleSupport.tableParts]]) and the
    * column-deny check in [[graft.SecurityContext]].
    */
  def tableParts(id: org.apache.spark.sql.catalyst.AliasIdentifier,
      scope: TableScope): (String, String, String) =
    id.qualifier match {
      case Seq() => (scope.catalog, scope.database, id.name)
      case Seq(db) => (scope.catalog, db, id.name)
      case parts => (parts.head, parts.last, id.name)
    }
}

/** Column-level deny violation scan, shared by [[graft.SecurityContext]]
  * (pre-rewrite, audited) and the auto-enforcement extension's check rule
  * (post-analysis): which base-table scans have an active
  * [[graft.policy.ColumnDenyPolicy]] column that the query READS.
  *
  * References are collected from the plan ABOVE each scan only — a temp
  * view's internal projections are not the user reading a column — and
  * from inside subquery expressions. Nodes the security rules themselves
  * injected (tagged Filter/mask Project) don't count as reads either: a
  * policy's filter condition or a full-width mask projection touching the
  * denied column is engine machinery, not the principal's query — without
  * this, extension mode (where the check runs AFTER injection) would deny
  * every masked table outright.
  */
object ColumnDenyCheck {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId, SubqueryExpression}

  private def isInjected(p: LogicalPlan): Boolean = p match {
    case f: Filter => f.getTagValue(SecurityTags.RowFilterApplied).contains(true)
    case pr: Project => pr.getTagValue(SecurityTags.MaskApplied).contains(true)
    case _ => false
  }

  /** The scan chain under a SubqueryAlias once engine-injected nodes are
    * stripped: Some(nodes from alias child down to the base table, base
    * included) when a base table is at the bottom. The chain's outputs
    * matter because the mask projection re-keys masked columns to fresh
    * exprIds — a reference above it uses the fresh id, a reference to a
    * passthrough column the original; denied-column ids are collected from
    * every node in the chain so both resolve.
    */
  private def injectedChain(p: LogicalPlan): Option[Seq[LogicalPlan]] = p match {
    case n if isInjected(n) => injectedChain(n.children.head).map(n +: _)
    case b if PlanShapes.isBaseTable(b) => Some(Seq(b))
    case _ => None
  }

  /** (cat.db.table, referenced denied columns) per violating scan.
    *
    * VIEW semantics (the bypass a naive boundary leaves open): a view
    * projecting a denied column (`CREATE VIEW v AS SELECT price AS p FROM
    * orders`) must deny `SELECT p FROM v` — the view's internal reference
    * IS the user's read, performed on their behalf. But a view's internals
    * must not count WHOLESALE either: a stored plan that merely PASSES
    * every column through (the normalized-timestamp temp views here) would
    * then deny unrelated queries. Resolution: after the user-plan walk,
    * each view's internals are walked DEMAND-DRIVEN — inside a view, a
    * Project entry contributes its references only when its output is
    * itself demanded (by the user or by a node above it in the view), the
    * standard column-pruning argument; every non-Project node contributes
    * all its references (a Filter/Aggregate inside the view executes
    * regardless of the select list — touching the column is reading it,
    * the fail-closed reading Hive's column authorization uses).
    */
  def violations(plan: LogicalPlan, user: String, policies: PolicyManager,
      scope: TableScope): Seq[(String, Seq[String])] = {
    // fast path: no column-deny policies at all -> skip the plan walk
    // (driver-side and plan-sized either way, but this runs per query)
    if (policies.columnDenyPolicies.isEmpty) return Nil
    val scans = plan.collectWithSubqueries {
      case SubqueryAlias(id, child) if injectedChain(child).isDefined =>
        (PlanShapes.tableParts(id, scope), injectedChain(child).get)
    }
    val denied = scans.map { case (parts, chain) =>
      (parts, chain, policies.deniedColumns(user, parts._1, parts._2, parts._3))
    }.filter(_._3.nonEmpty)
    if (denied.isEmpty) return Nil
    // phase 1: exprIds referenced in the USER's plan — stop descent at each
    // base-table scan (noting views for phase 2), skip injected nodes' own
    // expressions, descend into subquery expressions
    val ids = scala.collection.mutable.Set.empty[ExprId]
    // queued views carry the demand KNOWN AT QUEUE TIME: Some(explicit)
    // from a demanded context (possibly empty — processing re-derives from
    // `ids` and falls back to conservative when still empty), None from a
    // conservative context (everything inside counts)
    val views = scala.collection.mutable.Buffer.empty[(View, Option[Set[ExprId]])]
    def noteIfView(chain: Seq[LogicalPlan],
        demand: Option[Set[ExprId]]): Unit = chain.last match {
      case v: View => views += ((v, demand)); ()
      case _ => ()
    }
    def walk(p: LogicalPlan): Unit = {
      if (!isInjected(p)) p.expressions.foreach(_.foreach {
        case a: AttributeReference => ids += a.exprId; ()
        case s: SubqueryExpression => walk(s.plan)
        case _ => ()
      })
      // EXCEPT/INTERSECT compare FULL rows of both sides: every output
      // column of both children is read even when the user's select list
      // (which carries only the LEFT child's exprIds, per SetOperation
      // output semantics) never names it — without this a denied column in
      // the right branch, or an unselected one in the left, flows into the
      // set comparison unchecked.
      p match {
        case s: SetOperation =>
          s.children.foreach(c => ids ++= c.output.map(_.exprId))
        case _ => ()
      }
      p.children.foreach {
        case SubqueryAlias(_, child) if injectedChain(child).isDefined =>
          noteIfView(injectedChain(child).get, Some(Set.empty))
        case c => walk(c)
      }
    }
    walk(plan)
    // phase 2: demand-driven descent into each view's stored plan
    def refsOf(e: org.apache.spark.sql.catalyst.expressions.Expression,
        into: scala.collection.mutable.Set[ExprId]): Unit = e.foreach {
      case a: AttributeReference => into += a.exprId; ()
      // subquery plans inside a view: conservative full walk (fail-closed)
      case s: SubqueryExpression => walkDemand(s.plan, None); ()
      case _ => ()
    }
    // demanded None = everything counts (conservative mode)
    def walkDemand(p: LogicalPlan, demanded: Option[Set[ExprId]]): Unit = p match {
      case pr: Project =>
        val kept = demanded match {
          case Some(d) => pr.projectList.filter(ne => d.contains(ne.toAttribute.exprId))
          case None => pr.projectList
        }
        val refs = scala.collection.mutable.Set.empty[ExprId]
        kept.foreach(refsOf(_, refs))
        ids ++= refs
        walkDemand(pr.child, demanded.map(_ => refs.toSet))
      case SubqueryAlias(_, child) if injectedChain(child).isDefined =>
        noteIfView(injectedChain(child).get, demanded) // nested view scan: queue it
      case v: View =>
        views += ((v, demanded)); () // bare nested view (defensive): queue it
      case u: Union =>
        // Union output adopts branch-1 exprIds; demand maps POSITIONALLY
        // onto every branch, else branches 2..n see an empty demand set
        u.children.foreach { c =>
          val mapped = demanded.map { d =>
            c.output.zipWithIndex.collect {
              case (a, i) if d.contains(u.output(i).exprId) => a.exprId
            }.toSet
          }
          walkDemand(c, mapped)
        }
      case s: SetOperation =>
        // full-row comparison: every column of both sides is read
        s.children.foreach(walkDemand(_, None))
      case d: Distinct =>
        // row-wide dedup reads every output column regardless of demand
        walkDemand(d.child, Some(d.child.output.map(_.exprId).toSet))
      case _: LeafNode =>
        () // a leaf's expressions are its OUTPUT DEFINITION (LogicalRDD /
           // LocalRelation carry their attributes as constructor args),
           // not references — counting them would deny every view column
      case other =>
        val refs = scala.collection.mutable.Set.empty[ExprId]
        other.expressions.foreach(refsOf(_, refs))
        ids ++= refs
        other.children.foreach(walkDemand(_, demanded.map(_ ++ refs)))
    }
    // queue semantics: a view's internals may queue deeper views; each runs
    // with the demand visible at ITS processing time (ids only ever grows,
    // so late processing is the fail-closed direction). A view whose
    // resolved demand is EMPTY still feeds the plan's data flow (a bare
    // set-op branch whose exprIds the parent never adopts, SELECT 1 FROM v)
    // — demanded-mode would skip its internals entirely, the exact
    // fail-open a view bypass needs, so empty demand falls back to the
    // conservative walk.
    var i = 0
    while (i < views.length) {
      val (v, queuedDemand) = views(i); i += 1
      queuedDemand match {
        case None => walkDemand(v.child, None)
        case Some(explicit) =>
          val d = v.output.map(_.exprId).toSet
            .filter(id => ids.contains(id) || explicit.contains(id))
          if (d.isEmpty) walkDemand(v.child, None)
          else walkDemand(v.child, Some(d))
      }
    }
    denied.flatMap { case ((cat, db, table), chain, cols) =>
      val hit = chain.flatMap(_.output)
        .filter(a => cols.exists(_.equalsIgnoreCase(a.name)) && ids.contains(a.exprId))
        .map(_.name).distinct
      if (hit.isEmpty) None else Some((s"$cat.$db.$table", hit))
    }
  }
}

trait SecurityRuleSupport {
  def scope: TableScope
  def spark: SparkSession

  /** V1 leaf commands (CTAS, save, insert-into-dir, ...) embed their query as
    * an innerChild, NOT a child — tree traversals never see it, so without
    * explicit recursion a `CREATE TABLE ... AS SELECT policied_table` would
    * persist unfiltered, unmasked data. Rebuild the known command types with
    * a rewritten query; for an UNKNOWN leaf that still embeds logical plans
    * over policied tables, fail closed: an error beats a silent bypass.
    */
  protected def applyToEmbeddedQuery(plan: LogicalPlan,
      rewrite: LogicalPlan => LogicalPlan,
      isPolicied: (String, String, String) => Boolean): Option[LogicalPlan] = {
    import org.apache.spark.sql.execution.command.{CreateDataSourceTableAsSelectCommand, InsertIntoDataSourceDirCommand}
    import org.apache.spark.sql.execution.datasources.{InsertIntoDataSourceCommand, SaveIntoDataSourceCommand}
    // these command constructors assert query.resolved, and the row-filter
    // rule leaves injected conditions unresolved — re-analyze before rebuild
    def rw(q: LogicalPlan): LogicalPlan = {
      val r = rewrite(q)
      if (r.resolved) r else spark.sessionState.executePlan(r).analyzed
    }
    plan match {
      case c: CreateDataSourceTableAsSelectCommand => Some(c.copy(query = rw(c.query)))
      case c: InsertIntoDataSourceCommand => Some(c.copy(query = rw(c.query)))
      case c: SaveIntoDataSourceCommand => Some(c.copy(query = rw(c.query)))
      case c: InsertIntoDataSourceDirCommand => Some(c.copy(query = rw(c.query)))
      case leaf if leaf.children.isEmpty =>
        val policied = leaf.innerChildren.collect { case p: LogicalPlan => p }
          .flatMap(_.collect {
            case SubqueryAlias(id, child) if isBaseTable(child) =>
              tableParts(id)
          })
          .filter((isPolicied.apply _).tupled)
        if (policied.nonEmpty) throw new UnsupportedOperationException(
          s"${leaf.nodeName} embeds a query over policied table(s) " +
            s"${policied.map(_._3).distinct.mkString(", ")} that the security " +
            "rules cannot rewrite — refusing to execute it unenforced")
        None
      case _ => None
    }
  }

  /** A scan of a named table — the ONE shared predicate (also used by
    * [[SqlRenderer]]); see [[PlanShapes.isBaseTable]].
    */
  protected def isBaseTable(p: LogicalPlan): Boolean = PlanShapes.isBaseTable(p)

  /** (catalog, db, table) of a SubqueryAlias identifier; empty qualifiers get
    * the context's defaults, like Flink's validator qualifying bare names.
    */
  protected def tableParts(id: org.apache.spark.sql.catalyst.AliasIdentifier): (String, String, String) =
    PlanShapes.tableParts(id, scope)
}

/** Injects row-level-security filters for `user` (reference:
  * RowFilterVisitor.java:45-125).
  */
final case class RowFilterRule(
    spark: SparkSession,
    user: String,
    policies: PolicyManager,
    override val scope: TableScope,
    postAnalysis: Boolean = true,
    /** true: inject ONLY deny decisions (condition `false` on denied
      * tables), skipping allow-filters — the deny gate the mask-only entry
      * points run, so `dfDataMask`/`rewriteDataMask` alone can never return
      * rows of a denied table (fail-open relative to Ranger otherwise)
      * while still not smuggling row-filter semantics into a mask-only API.
      */
    denyOnly: Boolean = false
) extends Rule[LogicalPlan] with SecurityRuleSupport {

  private def alreadyFiltered(child: LogicalPlan): Boolean = child match {
    case f: Filter => f.getTagValue(SecurityTags.RowFilterApplied).contains(true)
    case _ => false
  }

  private val pf: PartialFunction[LogicalPlan, LogicalPlan] = {
    case sa @ SubqueryAlias(id, child) if isBaseTable(child) && !alreadyFiltered(child) =>
      val (cat, db, table) = tableParts(id)
      // deny checked FIRST and tagged as the deny it is (audit action
      // ROW_DENY): rowFilterConditions also collapses to `false` under an
      // active deny, but the trail must distinguish a deny decision from an
      // ordinary allow-filter that happens to be `false`
      val denied = policies.isDenied(user, cat, db, table)
      val conds =
        if (denied) Seq("false")
        else if (denyOnly) Seq.empty
        else policies.rowFilterConditions(user, cat, db, table)
      conds match {
        case Seq() => sa
        case conds =>
          val cond = conds
            .map { c =>
              try spark.sessionState.sqlParser.parseExpression(c)
              catch {
                case e: Exception => throw new IllegalArgumentException(
                  s"row-filter policy for user '$user' on $cat.$db.$table has " +
                    s"an unparseable condition: $c", e)
              }
            }
            .reduceLeft[Expression](And(_, _))
          val filter = Filter(cond, child)
          filter.setTagValue(SecurityTags.RowFilterApplied, true)
          if (denied)
            filter.setTagValue(SecurityTags.RowDenyAudit, s"$cat.$db.$table|DENY")
          else
            filter.setTagValue(SecurityTags.RowFilterAudit,
              s"$cat.$db.$table|${conds.mkString(" AND ")}")
          SubqueryAlias(id, filter)
      }
  }

  private def hasRowFilter(cat: String, db: String, table: String): Boolean =
    if (denyOnly) policies.isDenied(user, cat, db, table)
    else policies.rowFilterConditions(user, cat, db, table).nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan =
    applyToEmbeddedQuery(plan, apply, hasRowFilter).getOrElse {
      // transformUpWithSubqueries also reaches plans inside EXISTS/IN/scalar
      // subquery expressions — a policied table referenced there must be
      // filtered too. (In extension mode the analyzer's nested subquery
      // resolution re-enters the injected rules, so resolveOperatorsUp on the
      // outer plan suffices.)
      if (postAnalysis) plan.transformUpWithSubqueries(pf)
      else plan.resolveOperatorsUp(pf)
    }
}

/** Injects masking projections for `user` (reference:
  * DataMaskVisitor.java:54-157). For each scan of a policied table, builds a
  * full-width Project where masked columns become
  * `CAST(transformer(col) AS originalType) AS col` with the original exprId,
  * other columns pass through. MASK_NULL -> typed null, MASK_NONE ->
  * passthrough (the reference would NPE on these, DataMaskVisitor.java:97-98).
  */
final case class DataMaskRule(
    spark: SparkSession,
    user: String,
    policies: PolicyManager,
    override val scope: TableScope,
    /** false (default): reference semantics — injected row filters sit above
      * the mask and evaluate over MASKED values (SecurityContext.java:154-167).
      * true: Ranger-style composition — the masked Project wraps the injected
      * filter chain, so row filters evaluate over RAW values and only the
      * query's output is masked (the divergence switch of SURVEY §7.3).
      */
    filterOnRaw: Boolean = false,
    /** Collect identity-only access decisions into [[identityAudit]]. Off by
      * default so long-lived rule instances (the auto-enforcement extension,
      * where nobody drains the buffer) never accumulate.
      */
    auditIdentity: Boolean = false
) extends Rule[LogicalPlan] with SecurityRuleSupport {

  /** Side channel for identity-only access decisions: when every matched
    * mask policy on a scan is MASK_NONE (or a CUSTOM passthrough), no
    * Project is built, so there is no plan node to carry the audit tag —
    * but a matched policy is still an access decision a Ranger-style trail
    * must record. Auditing callers ([[graft.SecurityContext]]) drain this
    * after applying the rule. One `cat.db.table|col=TYPE,...` crumb per
    * identity-only scan, in visit order; per-rewrite instance, not
    * thread-shared.
    */
  val identityAudit = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Resolve a parsed transformer template against the scan's output. The
    * mask family's builders insert their own input casts, so the result is
    * fully resolved without an analyzer round trip — required because
    * transformUpWithNewOutput needs resolved outputs to propagate mappings.
    */
  private def resolveMaskExpr(raw: Expression, base: LogicalPlan): Expression = {
    val resolver = spark.sessionState.conf.resolver
    raw.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        base.resolve(u.nameParts, resolver).getOrElse(
          throw new IllegalArgumentException(
            s"mask transformer references unknown column ${u.name}"))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        // Keep any database/catalog qualifier in a custom transformer: a
        // template calling db.fn(col) must not silently resolve to the
        // unqualified fn.
        val fid = f.nameParts match {
          case Seq(fn) => org.apache.spark.sql.catalyst.FunctionIdentifier(fn)
          case Seq(db, fn) => org.apache.spark.sql.catalyst.FunctionIdentifier(fn, Some(db))
          case Seq(cat, db, fn) =>
            org.apache.spark.sql.catalyst.FunctionIdentifier(fn, Some(db), Some(cat))
          case other => throw new IllegalArgumentException(
            s"mask transformer function name too deeply qualified: ${other.mkString(".")}")
        }
        spark.sessionState.catalog.lookupFunction(fid, f.arguments)
    }
  }

  private def maskedProject(base: LogicalPlan, cat: String, db: String,
      table: String): Option[(LogicalPlan, Seq[(Attribute, Attribute)])] = {
    val mapping = Seq.newBuilder[(Attribute, Attribute)]
    // audit trail of applied policy decisions, in output-column order
    // (MASK_NONE passthroughs are recorded too — a matched policy is an
    // access decision even when the transformation is identity; when NO
    // real mask builds a Project to tag, the decisions go out through the
    // identityAudit side channel instead)
    val audited = Seq.newBuilder[String]
    var any = false
    def aliasAs(attr: Attribute, e: Expression): NamedExpression = {
      any = true
      val a = Alias(Cast(e, attr.dataType), attr.name)(qualifier = attr.qualifier)
      mapping += attr -> a.toAttribute
      a
    }
    val cols: Seq[NamedExpression] = base.output.map { attr =>
      policies.dataMaskType(user, cat, db, table, attr.name) match {
        case Some(t) if t.name.equalsIgnoreCase("MASK_NONE") =>
          audited += s"${attr.name}=${t.name}"
          attr
        case Some(t) if t.name.equalsIgnoreCase("MASK_NULL") =>
          audited += s"${attr.name}=${t.name}"
          val a = aliasAs(attr, Literal(null, attr.dataType))
          // renderer text: keep the CAST-back-to-declared-type convention
          // (DataMaskVisitor.java:131) — exprText strips casts otherwise
          a.setTagValue(SqlRenderer.MaskSqlTag,
            s"CAST(NULL AS ${attr.dataType.sql}) AS ${attr.name}")
          a
        case Some(t) =>
          t.transformerFor(s"`${attr.name}`") match {
            case Some(tpl) =>
              audited += s"${attr.name}=${t.name}"
              val a = aliasAs(attr,
                resolveMaskExpr(spark.sessionState.sqlParser.parseExpression(tpl), base))
              // the reference-exact output text for SqlRenderer's golden
              // parity: the policy's transformer template verbatim, CAST
              // back to the declared type (DataMaskVisitor.java:131)
              a.setTagValue(SqlRenderer.MaskSqlTag,
                s"CAST(${t.transformerFor(attr.name).get} AS ${attr.dataType.sql}) AS ${attr.name}")
              a
            case None => attr // CUSTOM without transformer: passthrough
          }
        case None => attr
      }
    }
    if (!any) {
      val ids = audited.result()
      if (auditIdentity && ids.nonEmpty)
        identityAudit += s"$cat.$db.$table|${ids.mkString(",")}"
      None
    } else {
      val p = Project(cols, base)
      p.setTagValue(SecurityTags.MaskApplied, true)
      p.setTagValue(SecurityTags.MaskAudit,
        s"$cat.$db.$table|${audited.result().mkString(",")}")
      Some((p, mapping.result()))
    }
  }

  /** Descend through filters already injected above the scan (row-filter rule
    * runs first) and wrap the base relation itself, so filters evaluate over
    * masked values — the reference's fixed composition order. Resolved
    * references in those filters are remapped onto the masked output; the
    * row-filter rule's still-unresolved conditions later resolve by name
    * against the masked Project, with the same effect.
    */
  private def injectUnderFilters(p: LogicalPlan, cat: String, db: String,
      table: String): Option[(LogicalPlan, Seq[(Attribute, Attribute)])] = p match {
    case f: Filter if filterOnRaw =>
      // Ranger-style: wrap the whole (injected) filter chain in the masked
      // Project. The filters below keep their raw attribute references; only
      // operators above see the masked, fresh-exprId output. Filter.output ==
      // scan output, so maskedProject builds directly over the chain.
      def bottomIsBase(q: LogicalPlan): Boolean = q match {
        case g: Filter => bottomIsBase(g.child)
        case pr: Project if pr.getTagValue(SecurityTags.MaskApplied).contains(true) => false
        case b => isBaseTable(b)
      }
      if (bottomIsBase(f)) maskedProject(f, cat, db, table) else None
    case f: Filter =>
      injectUnderFilters(f.child, cat, db, table).map { case (nc, mapping) =>
        val remapped = f.condition.transform {
          case a: AttributeReference =>
            mapping.collectFirst { case (from, to) if from.exprId == a.exprId => to }.getOrElse(a)
        }
        val nf = Filter(remapped, nc)
        f.getTagValue(SecurityTags.RowFilterApplied)
          .foreach(v => nf.setTagValue(SecurityTags.RowFilterApplied, v))
        f.getTagValue(SecurityTags.RowFilterAudit)
          .foreach(v => nf.setTagValue(SecurityTags.RowFilterAudit, v))
        f.getTagValue(SecurityTags.RowDenyAudit)
          .foreach(v => nf.setTagValue(SecurityTags.RowDenyAudit, v))
        (nf, mapping)
      }
    case pr: Project if pr.getTagValue(SecurityTags.MaskApplied).contains(true) =>
      None // re-entrancy guard
    case base if isBaseTable(base) => maskedProject(base, cat, db, table)
    case _ => None
  }

  private def hasMask(cat: String, db: String, table: String): Boolean =
    policies.hasDataMask(user, cat, db, table)

  override def apply(plan: LogicalPlan): LogicalPlan =
    applyToEmbeddedQuery(plan, apply, hasMask).getOrElse(applyToTree(plan))

  private def applyToTree(plan: LogicalPlan): LogicalPlan = {
    // mask tables referenced inside subquery expressions (EXISTS/IN/scalar)
    // first — transformUpWithNewOutput does not descend into them
    val withSubqueries = plan.transformAllExpressions {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        s.withNewPlan(apply(s.plan))
    }
    withSubqueries.transformUpWithNewOutput {
      case sa @ SubqueryAlias(id, child) =>
        val (cat, db, table) = tableParts(id)
        injectUnderFilters(child, cat, db, table) match {
          case Some((newChild, mapping)) => (SubqueryAlias(id, newChild), mapping)
          case None => (sa, Nil)
        }
    }
  }
}

/** Security rewrite for ROW-LEVEL DML — MERGE INTO / UPDATE / DELETE
  * against tables that implement `SupportsRowLevelOperations` (e.g.
  * [[graft.sources.GraftMemoryCatalog]]'s tables).
  *
  * The reference's only DML surface is `INSERT INTO ... SELECT`, where the
  * rewrite reaches inside the SELECT body (RewriteRowFilterTest.java:484-541,
  * RewriteDataMaskTest.java:363-436 — both ported). MERGE/UPDATE/DELETE are
  * the modern CDC-upsert equivalents, and the policy contract extends
  * naturally:
  *
  *   - ROW FILTER on the TARGET: constrains which existing rows the user
  *     can TOUCH. The filter is AND-ed into the condition of every
  *     matched / not-matched-by-source action (and the UPDATE/DELETE WHERE
  *     clause), so a row outside the user's filter is matched-but-untouched:
  *     it can never be updated or deleted, and because it still MATCHES,
  *     a WHEN NOT MATCHED insert cannot smuggle in a duplicate of it.
  *     (This is visible-but-untouchable write semantics, deliberately NOT
  *     Postgres-RLS invisible-row semantics — an invisible match would
  *     duplicate rather than protect.) Inserted values are not gated by the
  *     target's row filter, matching the reference's INSERT handling.
  *   - DENY on the target: the statement fails closed before planning.
  *   - ROW FILTER / MASK on the SOURCE (MERGE): the source subtree is a
  *     read like any other — both rules run on it, so a policied source
  *     feeds only visible rows and masked values into the merge.
  *   - COLUMN DENY: any reference to a denied column of the target (or of
  *     a source base table) in the statement's expressions fails closed.
  *     References are collected pre-resolution, so a BARE name that could
  *     resolve to either side checks against both — a fail-closed
  *     over-approximation, never fail-open.
  *
  * The injection happens on the PARSED plan (conditions stay unresolved and
  * the caller re-analyzes), because Catalyst's analyzer rewrites these
  * commands into `ReplaceData` group-replacement plans during analysis —
  * after that the action structure is gone. Injected target conditions are
  * qualified with the target's alias so they can never capture a
  * same-named source column.
  *
  * Scale note: the rewritten statement plans exactly like the unsecured
  * one plus a pushed-down predicate per action — group-based MERGE is one
  * full-outer join either way, and the injected conditions ride the merge
  * rows; no extra shuffle or pass (the SecurityTaxProbe argument applies
  * unchanged).
  */
final case class DmlSecurityRewrite(
    spark: SparkSession,
    user: String,
    policies: PolicyManager,
    override val scope: TableScope
) extends SecurityRuleSupport {

  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}

  /** Audit crumbs ("action|cat.db.table|detail") for decisions that have no
    * plan node to tag (the target-side constraint rewrites CONDITIONS, not
    * plans). Drained by [[graft.SecurityContext]] after the rewrite.
    */
  val dmlAudit = scala.collection.mutable.ArrayBuffer.empty[String]

  private def parts(rel: UnresolvedRelation): (String, String, String) =
    rel.multipartIdentifier match {
      case Seq(t) => (scope.catalog, scope.database, t)
      case Seq(db, t) => (scope.catalog, db, t)
      case ps => (ps.head, ps.init.last, ps.last)
    }

  /** (relation, qualifier-for-injected-conditions): the alias if the target
    * is aliased, the table name otherwise.
    */
  private def targetOf(plan: LogicalPlan): (UnresolvedRelation, String) = plan match {
    case SubqueryAlias(id, r: UnresolvedRelation) => (r, id.name)
    case r: UnresolvedRelation => (r, r.multipartIdentifier.last)
    case other => throw new UnsupportedOperationException(
      s"row-level DML target must be a named table, got ${other.nodeName}")
  }

  private def qualify(q: String, e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.length == 1 =>
      UnresolvedAttribute(q +: a.nameParts)
  }

  /** The target's combined row-filter condition for `user`, alias-qualified;
    * None when unpolicied. Fails closed on an active DENY.
    */
  private def targetConstraint(cat: String, db: String, table: String,
      qualifier: String): Option[Expression] = {
    if (policies.isDenied(user, cat, db, table)) {
      dmlAudit += s"ROW_DENY|$cat.$db.$table|DENY"
      throw new graft.ColumnAccessDeniedException(
        s"user '$user' is denied rows of $cat.$db.$table — row-level DML " +
          "against a denied table fails closed")
    }
    val conds = policies.rowFilterConditions(user, cat, db, table)
    if (conds.isEmpty) None
    else {
      val parsed = conds.map { c =>
        try spark.sessionState.sqlParser.parseExpression(c)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"row-filter policy for user '$user' on $cat.$db.$table has " +
              s"an unparseable condition: $c", e)
        }
      }
      dmlAudit += s"ROW_FILTER|$cat.$db.$table|${conds.mkString(" AND ")} (DML target constraint)"
      Some(parsed.map(qualify(qualifier, _)).reduceLeft[Expression](And(_, _)))
    }
  }

  private def and(cond: Option[Expression], extra: Expression): Option[Expression] =
    Some(cond.map(And(_, extra)).getOrElse(extra))

  private def constrain(actions: Seq[MergeAction], f: Expression): Seq[MergeAction] =
    actions.map {
      case a: UpdateAction => a.copy(condition = and(a.condition, f))
      case a: UpdateStarAction => a.copy(condition = and(a.condition, f))
      case a: DeleteAction => a.copy(condition = and(a.condition, f))
      case other => other // insert actions: not an existing-row touch
    }

  /** Fail closed when any expression of the statement references a denied
    * column of the target (refs qualified with the target alias, or bare)
    * or of a source base table (refs qualified with that table's
    * alias/name, or bare). Pre-resolution name matching — bare names check
    * against every side they COULD resolve to.
    */
  private def enforceColumnDeny(target: (String, String, String, String),
      sources: Seq[(String, String, String, String)],
      exprs: Seq[Expression]): Unit = {
    val refs = exprs.flatMap(_.collect {
      case a: UnresolvedAttribute => a.nameParts
    })
    def hits(cat: String, db: String, table: String, qual: String): Seq[String] = {
      val denied = policies.deniedColumns(user, cat, db, table)
        .map(_.toLowerCase)
      if (denied.isEmpty) Nil
      else refs.collect {
        case Seq(col) if denied.contains(col.toLowerCase) => col
        case Seq(q, col) if q.equalsIgnoreCase(qual) &&
          denied.contains(col.toLowerCase) => col
      }.distinct
    }
    val violations = (target +: sources).flatMap { case (c, d, t, q) =>
      val h = hits(c, d, t, q)
      if (h.isEmpty) Nil else Seq(s"$c.$d.$t" -> h)
    }
    if (violations.nonEmpty) {
      violations.foreach { case (obj, cols) =>
        dmlAudit += s"COLUMN_DENY|$obj|${cols.mkString(",")}"
      }
      throw new graft.ColumnAccessDeniedException(
        s"user '$user' is denied column(s) " +
          violations.map { case (o, cs) => s"$o.(${cs.mkString(",")})" }
            .mkString("; ") + " — the DML statement references them and fails closed")
    }
  }

  /** Base tables of a (parsed) source subtree with their reference
    * qualifier: the nearest alias if present, else the table name.
    */
  private def sourceTables(plan: LogicalPlan): Seq[(String, String, String, String)] =
    plan.collect {
      case SubqueryAlias(id, r: UnresolvedRelation) =>
        val (c, d, t) = parts(r); (c, d, t, id.name)
      case r: UnresolvedRelation =>
        val (c, d, t) = parts(r); (c, d, t, r.multipartIdentifier.last)
    }

  /** Source subtree through the ordinary read rewrite: analyze standalone,
    * inject row filters then masks, re-analyze if needed, splice back. The
    * surrounding (still-parsed) statement resolves around the already-
    * analyzed subtree.
    */
  private def secureSource(plan: LogicalPlan): LogicalPlan = {
    val analyzed = spark.sessionState.executePlan(plan).analyzed
    val filtered = RowFilterRule(spark, user, policies, scope)(analyzed)
    val masked = DataMaskRule(spark, user, policies, scope)(filtered)
    if (masked.resolved) masked
    else spark.sessionState.executePlan(masked).analyzed
  }

  /** Rewrite one parsed row-level DML statement. Returns the modified
    * parsed plan (caller analyzes + executes).
    */
  def apply(parsed: LogicalPlan): LogicalPlan = parsed match {
    case m: MergeIntoTable =>
      val (rel, qualifier) = targetOf(m.targetTable)
      val (cat, db, table) = parts(rel)
      val srcs = sourceTables(m.sourceTable)
      enforceColumnDeny((cat, db, table, qualifier), srcs,
        Seq(m.mergeCondition) ++
          (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
            .flatMap(a => a.condition.toSeq ++ (a match {
              case u: UpdateAction => u.assignments.flatMap(x => Seq(x.key, x.value))
              case i: InsertAction => i.assignments.flatMap(x => Seq(x.key, x.value))
              case _ => Nil
            })))
      val constrained = targetConstraint(cat, db, table, qualifier) match {
        case Some(f) => m.copy(
          matchedActions = constrain(m.matchedActions, f),
          notMatchedBySourceActions = constrain(m.notMatchedBySourceActions, f))
        case None => m
      }
      constrained.copy(sourceTable = secureSource(m.sourceTable))
    case u: UpdateTable =>
      val (rel, qualifier) = targetOf(u.table)
      val (cat, db, table) = parts(rel)
      enforceColumnDeny((cat, db, table, qualifier), Nil,
        u.condition.toSeq ++ u.assignments.flatMap(a => Seq(a.key, a.value)))
      targetConstraint(cat, db, table, qualifier) match {
        case Some(f) => u.copy(condition = and(u.condition, f))
        case None => u
      }
    case d: DeleteFromTable =>
      val (rel, qualifier) = targetOf(d.table)
      val (cat, db, table) = parts(rel)
      enforceColumnDeny((cat, db, table, qualifier), Nil, Seq(d.condition))
      targetConstraint(cat, db, table, qualifier) match {
        case Some(f) => d.copy(condition = And(d.condition, f))
        case None => d
      }
    case other => throw new UnsupportedOperationException(
      s"not a row-level DML statement: ${other.nodeName} " +
        "(use the query rewrite entry points for reads, execute() for DDL/INSERT)")
  }
}
