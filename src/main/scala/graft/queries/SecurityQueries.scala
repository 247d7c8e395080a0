package graft.queries

import graft.SecurityContext
import graft.policy.{DataMaskPolicy, DenyRowPolicy, RowFilterPolicy}
import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  /** When set (graft.Verify does), [[df]] marks each input table `.cache()`
    * on first load, so a 193-query dump scans each parquet input once
    * instead of once per query. Off by default: Bench and the plan-shape
    * specs must measure/assert the real scan path.
    */
  val cacheInputs = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Memoized per (session, dir, name): the plan is identical every time,
    * and re-building it costs a file listing + footer schema read per call —
    * material across a full Verify/Bench run's hundreds of loads. WEAKLY
    * keyed on the session so a stopped SparkSession (and every DataFrame /
    * cache entry hanging off it) stays collectable across a long multi-suite
    * JVM — the memo must never outlive the session it belongs to.
    */
  private val dfMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), org.apache.spark.sql.DataFrame]]())

  /** Read one testdata table, normalizing the `ts` column to session-zoned
    * TIMESTAMP whatever the writer used: TIMESTAMP(NANOS) (Spark's
    * vectorized reader rejects it — read nanos as long, truncate to micros)
    * or naive timestamp[us] (read as TIMESTAMP_NTZ — cast, which in the UTC
    * session keeps the wall clock DuckDB sees). All bucketing is >= 1s, so
    * either normalization is oracle-safe.
    */
  def df(spark: SparkSession, dir: String, name: String): org.apache.spark.sql.DataFrame = {
    val perSession = {
      val existing = dfMemo.get(spark)
      if (existing != null) existing
      else {
        val fresh = scala.collection.concurrent.TrieMap
          .empty[(String, String), org.apache.spark.sql.DataFrame]
        val raced = dfMemo.putIfAbsent(spark, fresh)
        if (raced != null) raced else fresh
      }
    }
    perSession.getOrElseUpdate((dir, name), {
      graft.functions.VectorFunctions.register(spark)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val normalized = raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(org.apache.spark.sql.types.LongType) => raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
        case Some(org.apache.spark.sql.types.TimestampNTZType) => raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
      if (cacheInputs.get) normalized.cache() else normalized
    })
  }

  /** Register the named testdata tables as temp views for `dir`. */
  def load(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}

/** Security-plane queries for the driver's correctness gate: each runs a
  * policy rewrite through [[SecurityContext]] and has a DuckDB oracle that
  * states the *rewritten* semantics in plain SQL.
  *
  * Determinism rules: every query ORDER BYs a unique key; double aggregates
  * go through DECIMAL casts (exact, order-independent).
  */
object SecurityQueries {

  private val USER = "analyst"
  private val CAT = "spark_catalog"
  private val DB = "default"

  private def ctx(spark: SparkSession, dir: String, tables: String*)(
      policies: SecurityContext => Unit): SecurityContext = {
    Tables.load(spark, dir, tables: _*)
    val c = new SecurityContext(spark)
    policies(c)
    c
  }

  private def rls(c: SecurityContext, table: String, cond: String): Unit =
    c.policyManager.addPolicy(RowFilterPolicy(USER, CAT, DB, table, cond))
  private def mask(c: SecurityContext, table: String, col: String, t: String): Unit =
    c.policyManager.addPolicy(DataMaskPolicy(USER, CAT, DB, table, col, t))

  // DuckDB equivalent of Hive mask() defaults on a string column
  private def duckMask(col: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($col,'[A-Z]','X','g'),'[a-z]','x','g'),'[0-9]','n','g')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sec_rls_basic" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => rls(c, "customer", "c_mktsegment = 'BUILDING'"))
      c.dfRowFilter(USER,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")
    }),
    "sec_rls_join" -> ((s, dir) => {
      val c = ctx(s, dir, "orders", "customer", "nation") { c =>
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
        rls(c, "orders", "o_orderstatus = 'F'")
        rls(c, "nation", "n_regionkey = 1")
      }
      c.dfRowFilter(USER,
        """SELECT o.o_orderkey, c.c_name, n.n_name
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN nation n ON c.c_nationkey = n.n_nationkey
          |ORDER BY o.o_orderkey""".stripMargin)
    }),
    "sec_rls_agg" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => rls(c, "customer", "c_nationkey < 10"))
      c.dfRowFilter(USER,
        """SELECT c_mktsegment, count(*) AS cnt,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),
    "sec_rls_subquery" -> ((s, dir) => {
      val c = ctx(s, dir, "orders")(c => rls(c, "orders", "o_orderstatus = 'F'"))
      c.dfRowFilter(USER,
        """SELECT t.o_orderkey, t.o_totalprice FROM
          |  (SELECT * FROM orders WHERE o_totalprice > 300000.0) t
          |ORDER BY t.o_orderkey""".stripMargin)
    }),
    "sec_mask_basic" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => mask(c, "customer", "c_name", "MASK"))
      c.dfDataMask(USER, "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    }),
    "sec_mask_show_first4" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => mask(c, "customer", "c_name", "MASK_SHOW_FIRST_4"))
      c.dfDataMask(USER, "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    }),
    "sec_mask_show_last4" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => mask(c, "customer", "c_name", "MASK_SHOW_LAST_4"))
      c.dfDataMask(USER, "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    }),
    "sec_mask_hash" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => mask(c, "customer", "c_name", "MASK_HASH"))
      c.dfDataMask(USER, "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
    }),
    "sec_mask_null" -> ((s, dir) => {
      val c = ctx(s, dir, "customer")(c => mask(c, "customer", "c_acctbal", "MASK_NULL"))
      c.dfDataMask(USER, "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey")
    }),
    "sec_mask_date_year" -> ((s, dir) => {
      val c = ctx(s, dir, "orders")(c => mask(c, "orders", "o_orderdate", "MASK_DATE_SHOW_YEAR"))
      c.dfDataMask(USER, "SELECT o_orderkey, o_orderdate FROM orders ORDER BY o_orderkey")
    }),
    // numeric-input masking (Hive numberChar semantics): digits replaced,
    // sign/digit count/original type preserved — BIGINT stays BIGINT
    "sec_mask_numeric" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        mask(c, "customer", "c_custkey", "MASK_SHOW_LAST_4")
        mask(c, "customer", "c_nationkey", "MASK")
      }
      c.dfDataMask(USER,
        "SELECT c_custkey, c_nationkey, c_name FROM customer ORDER BY c_name")
    }),
    "sec_mixed" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
        mask(c, "customer", "c_name", "MASK_SHOW_FIRST_4")
      }
      c.dfMixed(USER,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")
    }),
    "sec_mixed_masked_filter" -> ((s, dir) => {
      // the composition quirk: the row filter evaluates over MASKED values
      val c = ctx(s, dir, "customer") { c =>
        rls(c, "customer", "c_mktsegment = 'XXXXXXXX'")
        mask(c, "customer", "c_mktsegment", "MASK")
      }
      c.dfMixed(USER, "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey")
    }),
    // Ranger-parity extension (reference PolicyManager.java:35 names Ranger
    // as intent): the policy principal is a GROUP; the filter applies to the
    // member and composes (ANDs) with the user's own policy
    "sec_rls_group" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        c.policyManager.addUserToGroup(USER, "analysts")
        c.policyManager.addPolicy(RowFilterPolicy(
          "analysts", CAT, DB, "customer", "c_nationkey < 10"))
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
      }
      c.dfRowFilter(USER,
        "SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer ORDER BY c_custkey")
    }),
    // wildcard principal ('*' = every user) and wildcard table ('*' = every
    // table): both conditions AND into the scan alongside nothing else —
    // the user has no policy of their own
    "sec_rls_wildcard" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        c.policyManager.addPolicy(RowFilterPolicy(
          "*", CAT, DB, "customer", "c_acctbal > 0.0"))
        c.policyManager.addPolicy(RowFilterPolicy(
          USER, CAT, DB, "*", "c_nationkey < 20"))
      }
      c.dfRowFilter(USER,
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer ORDER BY c_custkey")
    }),
    // mask precedence, specific-beats-wildcard: a '*'-user MASK_NULL
    // baseline on c_name is overridden for this user by their exact
    // MASK_SHOW_FIRST_4; c_mktsegment keeps the wildcard MASK_HASH (no
    // specific policy). The oracle states exactly that composition.
    "sec_mask_precedence" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        c.policyManager.addPolicy(DataMaskPolicy(
          "*", CAT, DB, "customer", "c_name", "MASK_NULL"))
        c.policyManager.addPolicy(DataMaskPolicy(
          "*", CAT, DB, "customer", "c_mktsegment", "MASK_HASH"))
        mask(c, "customer", "c_name", "MASK_SHOW_FIRST_4")
      }
      c.dfDataMask(USER,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")
    }),
    // the Ranger-style audit trail: every rewrite records its submission
    // plus one row per policy application (table + injected condition /
    // masked-column list). Four submissions — mixed over a policied table,
    // row-filter over another, a no-policy principal (QUERY row only), and
    // a two-table join recording per-scan decisions — then the trail
    // itself is the result. Deterministic: seq is call order on a fresh
    // context, details are policy strings verbatim.
    "sec_audit" -> ((s, dir) => {
      val c = ctx(s, dir, "customer", "orders") { c =>
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
        mask(c, "customer", "c_name", "MASK_HASH")
        rls(c, "orders", "o_orderstatus = 'F'")
      }
      c.dfMixed(USER, "SELECT c_custkey, c_name FROM customer")
      c.dfRowFilter(USER, "SELECT o_orderkey FROM orders")
      c.dfMixed("intern", "SELECT o_orderkey FROM orders")
      c.dfMixed(USER,
        "SELECT o.o_orderkey, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      c.auditLog.orderBy("seq")
    }),
    // Ranger deny overrides allow at every specificity: the user's EXACT
    // allow-filter on orders is beaten by a WILDCARD-principal deny (the
    // adversarial direction — specific-allow vs least-specific-deny), so
    // the orders branch of the union contributes zero rows while the
    // customer branch keeps its ordinary row filter. One statement, so the
    // deny is exercised inside a set-op FROM tree, not just a plain scan.
    "sec_rls_deny" -> ((s, dir) => {
      val c = ctx(s, dir, "orders", "customer") { c =>
        rls(c, "orders", "o_orderstatus = 'F'")
        c.policyManager.addPolicy(DenyRowPolicy("*", CAT, DB, "orders"))
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
      }
      c.dfRowFilter(USER,
        """SELECT 'orders' AS src, o_orderkey AS id FROM orders
          |UNION ALL
          |SELECT 'customer' AS src, c_custkey AS id FROM customer
          |ORDER BY src, id""".stripMargin)
    }),
    // COLUMN-level deny, fail-closed at analysis time: reading the denied
    // column — explicitly or via SELECT * expansion — throws (never a
    // silent null or mask; deny beats the mask at any specificity), while
    // a query over the table's OTHER columns keeps its ordinary row-filter
    // + mask rewrites. Each denial lands in the audit trail (COLUMN_DENY
    // after its submission's QUERY row); the trail is the result and the
    // oracle states it as constants. The require()s make the two throws
    // part of the oracled behavior: a fail-open regression aborts the
    // query instead of producing a hash-matching trail.
    "sec_col_deny" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        c.policyManager.addPolicy(graft.policy.ColumnDenyPolicy(
          USER, CAT, DB, "customer", "c_acctbal"))
        mask(c, "customer", "c_name", "MASK_HASH")
        rls(c, "customer", "c_mktsegment = 'BUILDING'")
      }
      c.dfMixed(USER,
        "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey")
      val explicitDenied =
        try { c.dfMixed(USER, "SELECT c_custkey, c_acctbal FROM customer"); false }
        catch { case _: graft.ColumnAccessDeniedException => true }
      val starDenied =
        try { c.dfRowFilter(USER, "SELECT * FROM customer"); false }
        catch { case _: graft.ColumnAccessDeniedException => true }
      require(explicitDenied && starDenied,
        s"column deny failed to fire (explicit=$explicitDenied, star=$starDenied)")
      c.auditLog.orderBy("seq")
    }),
    // policy validity windows under a pinned clock: of three row filters
    // only the one whose [validFrom, validUntil) covers "now" applies —
    // the expired and future ones contribute nothing — and an EXPIRED deny
    // no longer denies (rows flow; the window gates the deny too)
    "sec_rls_window" -> ((s, dir) => {
      val c = ctx(s, dir, "customer") { c =>
        c.policyManager.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
        c.policyManager.addPolicy(RowFilterPolicy(USER, CAT, DB, "customer",
          "c_acctbal < 0.0", validUntil = Some("2026-01-01T00:00:00Z")))
        c.policyManager.addPolicy(RowFilterPolicy(USER, CAT, DB, "customer",
          "c_nationkey > 99", validFrom = Some("2030-01-01T00:00:00Z")))
        c.policyManager.addPolicy(RowFilterPolicy(USER, CAT, DB, "customer",
          "c_mktsegment = 'BUILDING'",
          validFrom = Some("2026-01-01T00:00:00Z"),
          validUntil = Some("2027-01-01T00:00:00Z")))
        c.policyManager.addPolicy(DenyRowPolicy(USER, CAT, DB, "customer",
          validUntil = Some("2026-06-01T00:00:00Z")))
      }
      c.dfRowFilter(USER,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")
    }),

    // ---- row-level DML (MERGE INTO / UPDATE / DELETE) on the DSv2 memory
    // catalog's SupportsRowLevelOperations path, through
    // SecurityContext.executeDml. The memory-table fixtures are seeded
    // FROM the parquet tables with an ABSOLUTE key cap, so the mutable
    // state stays fixture-sized at every SF (the memory catalog is the
    // local/test connector; the scale path for row-level DML is the same
    // group/delta replace contract on a real format). Each oracle states
    // the post-DML table as a pure SELECT over the same parquet inputs
    // (the driver's DuckDB has no MERGE statement). ----
    "cdc_merge_upsert" -> ((s, dir) => {
      memCat(s)
      seedOrdersTable(s, dir, "cdc_mu_t")
      val c = new SecurityContext(s)
      // CDC upsert: matched keys take the change row, new keys insert —
      // the source is a real parquet read (the rewrite-inside-body shape)
      c.executeDml("admin",
        """MERGE INTO graft_mem.default.cdc_mu_t AS t
          |USING (SELECT o_orderkey AS k, 'U' AS st,
          |              CAST(round(o_totalprice * 100) AS BIGINT) + 11111 AS cents
          |       FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000) AS s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET st = s.st, cents = s.cents
          |WHEN NOT MATCHED THEN INSERT (k, st, cents) VALUES (s.k, s.st, s.cents)""".stripMargin)
      s.table("graft_mem.default.cdc_mu_t").orderBy("k")
    }),
    "cdc_update_delete" -> ((s, dir) => {
      memCat(s)
      seedOrdersTable(s, dir, "cdc_ud_t")
      val c = new SecurityContext(s)
      c.executeDml("admin",
        "UPDATE graft_mem.default.cdc_ud_t SET st = 'X', cents = cents + 5 WHERE k % 10 = 0")
      c.executeDml("admin",
        "DELETE FROM graft_mem.default.cdc_ud_t WHERE cents > 30000000")
      s.table("graft_mem.default.cdc_ud_t").orderBy("k")
    }),
    "sec_merge_rls" -> ((s, dir) => {
      memCat(s)
      seedCustomerTable(s, dir, "sec_mr_t")
      val c = new SecurityContext(s)
      c.policyManager.addPolicy(RowFilterPolicy(
        USER, "graft_mem", "default", "sec_mr_t", "seg = 'BUILDING'"))
      // matched rows OUTSIDE the filter are visible-but-untouchable: not
      // updated, and not re-inserted (they still match)
      c.executeDml(USER,
        """MERGE INTO graft_mem.default.sec_mr_t AS t
          |USING (SELECT c_custkey AS k, c_mktsegment AS seg,
          |              CAST(round(c_acctbal * 100) AS BIGINT) + 999 AS cents
          |       FROM customer WHERE c_custkey BETWEEN 1500 AND 4500) AS s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET cents = s.cents
          |WHEN NOT MATCHED THEN INSERT (k, seg, cents) VALUES (s.k, s.seg, s.cents)""".stripMargin)
      s.table("graft_mem.default.sec_mr_t").orderBy("k")
    }),
    "sec_dml_rls" -> ((s, dir) => {
      memCat(s)
      seedCustomerTable(s, dir, "sec_ud_t")
      val c = new SecurityContext(s)
      c.policyManager.addPolicy(RowFilterPolicy(
        USER, "graft_mem", "default", "sec_ud_t", "seg = 'BUILDING'"))
      c.executeDml(USER,
        "UPDATE graft_mem.default.sec_ud_t SET cents = 0 WHERE cents < 0")
      c.executeDml(USER,
        "DELETE FROM graft_mem.default.sec_ud_t WHERE cents > 500000")
      s.table("graft_mem.default.sec_ud_t").orderBy("k")
    }),
    "sec_merge_mask_source" -> ((s, dir) => {
      memCat(s)
      Tables.load(s, dir, "customer")
      s.sql("DROP TABLE IF EXISTS graft_mem.default.sec_mm_t")
      s.sql("CREATE TABLE graft_mem.default.sec_mm_t (k BIGINT, name STRING)")
      s.sql("""INSERT INTO graft_mem.default.sec_mm_t
        SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 1000""")
      val c = new SecurityContext(s)
      // mask policy on the SOURCE: everything the user's merge reads from
      // it — matched updates and inserts alike — arrives masked
      c.policyManager.addPolicy(DataMaskPolicy(
        USER, CAT, DB, "customer", "c_name", "MASK"))
      c.executeDml(USER,
        """MERGE INTO graft_mem.default.sec_mm_t AS t
          |USING (SELECT c_custkey AS k, c_name AS name FROM customer
          |       WHERE c_custkey BETWEEN 500 AND 4000) AS s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET name = s.name
          |WHEN NOT MATCHED THEN INSERT (k, name) VALUES (s.k, s.name)""".stripMargin)
      s.table("graft_mem.default.sec_mm_t").orderBy("k")
    })
  )

  private def memCat(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft_mem",
      classOf[graft.sources.GraftMemoryCatalog].getName)

  /** (k, st, cents) from orders, keys capped at 2000 — a constant-size
    * fixture at every SF (key space is generation-stable).
    */
  private def seedOrdersTable(s: SparkSession, dir: String, name: String): Unit = {
    Tables.load(s, dir, "orders")
    s.sql(s"DROP TABLE IF EXISTS graft_mem.default.$name")
    s.sql(s"CREATE TABLE graft_mem.default.$name (k BIGINT, st STRING, cents BIGINT)")
    s.sql(s"""INSERT INTO graft_mem.default.$name
      SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey <= 2000""")
  }

  /** (k, seg, cents) from customer, keys capped at 3000. */
  private def seedCustomerTable(s: SparkSession, dir: String, name: String): Unit = {
    Tables.load(s, dir, "customer")
    s.sql(s"DROP TABLE IF EXISTS graft_mem.default.$name")
    s.sql(s"CREATE TABLE graft_mem.default.$name (k BIGINT, seg STRING, cents BIGINT)")
    s.sql(s"""INSERT INTO graft_mem.default.$name
      SELECT c_custkey, c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT)
      FROM customer WHERE c_custkey <= 3000""")
  }

  val oracles: Map[String, String] = Map(
    "sec_rls_basic" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "sec_rls_join" ->
      """SELECT o.o_orderkey, c.c_name, n.n_name
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F' AND n.n_regionkey = 1
        |ORDER BY o.o_orderkey""".stripMargin,
    "sec_rls_agg" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer WHERE c_nationkey < 10
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "sec_rls_subquery" ->
      """SELECT t.o_orderkey, t.o_totalprice FROM
        |  (SELECT * FROM orders WHERE o_totalprice > 300000.0 AND o_orderstatus = 'F') t
        |ORDER BY t.o_orderkey""".stripMargin,
    "sec_mask_basic" ->
      s"""SELECT c_custkey, ${duckMask("c_name")} AS c_name
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "sec_mask_show_first4" ->
      """SELECT c_custkey,
        |       substr(c_name,1,4) || regexp_replace(substr(c_name,5),'[A-Za-z0-9]','x','g') AS c_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sec_mask_show_last4" ->
      """SELECT c_custkey,
        |       CASE WHEN length(c_name) <= 4 THEN c_name
        |            ELSE regexp_replace(substr(c_name,1,length(c_name)-4),'[A-Za-z0-9]','x','g')
        |                 || substr(c_name,length(c_name)-3) END AS c_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sec_mask_hash" ->
      """SELECT c_custkey, sha256(c_name) AS c_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sec_mask_null" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sec_mask_date_year" ->
      """SELECT o_orderkey,
        |       CAST(make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS TIMESTAMP) AS o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sec_mask_numeric" ->
      """SELECT CASE WHEN length(CAST(c_custkey AS VARCHAR)) <= 4 THEN c_custkey
        |            ELSE CAST(repeat('1', length(CAST(c_custkey AS VARCHAR)) - 4)
        |                      || substr(CAST(c_custkey AS VARCHAR),
        |                                length(CAST(c_custkey AS VARCHAR)) - 3) AS BIGINT)
        |       END AS c_custkey,
        |       CAST(repeat('1', length(CAST(c_nationkey AS VARCHAR))) AS INTEGER) AS c_nationkey,
        |       c_name
        |FROM customer ORDER BY c_name""".stripMargin,
    "sec_mixed" ->
      """SELECT c_custkey,
        |       substr(c_name,1,4) || regexp_replace(substr(c_name,5),'[A-Za-z0-9]','x','g') AS c_name,
        |       c_mktsegment
        |FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "sec_mixed_masked_filter" ->
      s"""SELECT c_custkey, ${duckMask("c_mktsegment")} AS c_mktsegment
         |FROM customer
         |WHERE ${duckMask("c_mktsegment")} = 'XXXXXXXX'
         |ORDER BY c_custkey""".stripMargin,
    "sec_rls_group" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 10
        |ORDER BY c_custkey""".stripMargin,
    "sec_rls_wildcard" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        |WHERE c_acctbal > 0.0 AND c_nationkey < 20
        |ORDER BY c_custkey""".stripMargin,
    "sec_mask_precedence" ->
      """SELECT c_custkey,
        |       substr(c_name,1,4) || regexp_replace(substr(c_name,5),'[A-Za-z0-9]','x','g') AS c_name,
        |       sha256(c_mktsegment) AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // the audit trail is fully determined by the call sequence: the oracle
    // states it as constants (a submission row per rewrite, a decision row
    // per policied scan in FROM order, filter decisions before mask)
    "sec_audit" ->
      """SELECT CAST(seq AS BIGINT) AS seq, principal, action, obj, detail
        |FROM (VALUES
        |  (0, 'analyst', 'QUERY', 'mixed', 'SELECT c_custkey, c_name FROM customer'),
        |  (1, 'analyst', 'ROW_FILTER', 'spark_catalog.default.customer', 'c_mktsegment = ''BUILDING'''),
        |  (2, 'analyst', 'DATA_MASK', 'spark_catalog.default.customer', 'c_name=MASK_HASH'),
        |  (3, 'analyst', 'QUERY', 'row_filter', 'SELECT o_orderkey FROM orders'),
        |  (4, 'analyst', 'ROW_FILTER', 'spark_catalog.default.orders', 'o_orderstatus = ''F'''),
        |  (5, 'intern', 'QUERY', 'mixed', 'SELECT o_orderkey FROM orders'),
        |  (6, 'analyst', 'QUERY', 'mixed', 'SELECT o.o_orderkey, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey'),
        |  (7, 'analyst', 'ROW_FILTER', 'spark_catalog.default.orders', 'o_orderstatus = ''F'''),
        |  (8, 'analyst', 'ROW_FILTER', 'spark_catalog.default.customer', 'c_mktsegment = ''BUILDING'''),
        |  (9, 'analyst', 'DATA_MASK', 'spark_catalog.default.customer', 'c_name=MASK_HASH')
        |) t(seq, principal, action, obj, detail)
        |ORDER BY seq""".stripMargin,
    // deny => the orders branch is WHERE false; the customer branch keeps
    // its ordinary filter
    "sec_rls_deny" ->
      """SELECT 'orders' AS src, o_orderkey AS id FROM orders WHERE false
        |UNION ALL
        |SELECT 'customer' AS src, c_custkey AS id FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY src, id""".stripMargin,
    // the trail is fully determined by the call sequence: allowed query
    // (QUERY + its filter/mask decisions), then one QUERY + COLUMN_DENY
    // pair per denied submission
    "sec_col_deny" ->
      """SELECT CAST(seq AS BIGINT) AS seq, principal, action, obj, detail
        |FROM (VALUES
        |  (0, 'analyst', 'QUERY', 'mixed', 'SELECT c_custkey, c_name FROM customer ORDER BY c_custkey'),
        |  (1, 'analyst', 'ROW_FILTER', 'spark_catalog.default.customer', 'c_mktsegment = ''BUILDING'''),
        |  (2, 'analyst', 'DATA_MASK', 'spark_catalog.default.customer', 'c_name=MASK_HASH'),
        |  (3, 'analyst', 'QUERY', 'mixed', 'SELECT c_custkey, c_acctbal FROM customer'),
        |  (4, 'analyst', 'COLUMN_DENY', 'spark_catalog.default.customer', 'c_acctbal'),
        |  (5, 'analyst', 'QUERY', 'row_filter', 'SELECT * FROM customer'),
        |  (6, 'analyst', 'COLUMN_DENY', 'spark_catalog.default.customer', 'c_acctbal')
        |) t(seq, principal, action, obj, detail)
        |ORDER BY seq""".stripMargin,
    // only the in-window filter applies; the expired deny does not
    "sec_rls_window" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    // ---- row-level DML: each oracle states the POST-DML table as a pure
    // SELECT (DuckDB 1.0 has no MERGE statement): updated/kept rows via
    // LEFT JOIN + CASE, inserts via NOT EXISTS ----
    "cdc_merge_upsert" ->
      """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders WHERE o_orderkey <= 2000),
        |     s AS (SELECT o_orderkey AS k, 'U' AS st,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) + 11111 AS cents
        |           FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000)
        |SELECT t.k, coalesce(s.st, t.st) AS st, coalesce(s.cents, t.cents) AS cents
        |FROM t LEFT JOIN s ON t.k = s.k
        |UNION ALL
        |SELECT s.k, s.st, s.cents FROM s
        |WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.k = s.k)
        |ORDER BY k""".stripMargin,
    "cdc_update_delete" ->
      """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders WHERE o_orderkey <= 2000),
        |     u AS (SELECT k,
        |                  CASE WHEN k % 10 = 0 THEN 'X' ELSE st END AS st,
        |                  CASE WHEN k % 10 = 0 THEN cents + 5 ELSE cents END AS cents
        |           FROM t)
        |SELECT k, st, cents FROM u WHERE cents <= 30000000 ORDER BY k""".stripMargin,
    // the analyst's filter is seg = 'BUILDING': only BUILDING rows take the
    // matched update; out-of-filter matches stay put and are NOT duplicated
    "sec_merge_rls" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer WHERE c_custkey <= 3000),
        |     s AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) + 999 AS cents
        |           FROM customer WHERE c_custkey BETWEEN 1500 AND 4500)
        |SELECT t.k, t.seg,
        |       CASE WHEN s.k IS NOT NULL AND t.seg = 'BUILDING'
        |            THEN s.cents ELSE t.cents END AS cents
        |FROM t LEFT JOIN s ON t.k = s.k
        |UNION ALL
        |SELECT s.k, s.seg, s.cents FROM s
        |WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.k = s.k)
        |ORDER BY k""".stripMargin,
    "sec_dml_rls" ->
      """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer WHERE c_custkey <= 3000),
        |     u AS (SELECT k, seg,
        |                  CASE WHEN seg = 'BUILDING' AND cents < 0
        |                       THEN 0 ELSE cents END AS cents
        |           FROM t)
        |SELECT k, seg, cents FROM u
        |WHERE NOT (seg = 'BUILDING' AND cents > 500000)
        |ORDER BY k""".stripMargin,
    "sec_merge_mask_source" ->
      s"""WITH t AS (SELECT c_custkey AS k, c_name AS name FROM customer
        |           WHERE c_custkey <= 1000),
        |     s AS (SELECT c_custkey AS k, ${duckMask("c_name")} AS name
        |           FROM customer WHERE c_custkey BETWEEN 500 AND 4000)
        |SELECT t.k, CASE WHEN s.k IS NULL THEN t.name ELSE s.name END AS name
        |FROM t LEFT JOIN s ON t.k = s.k
        |UNION ALL
        |SELECT s.k, s.name FROM s
        |WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.k = s.k)
        |ORDER BY k""".stripMargin
  )
}
