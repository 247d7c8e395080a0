package graft.policy

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's PolicyManagerTest.java:38-48 semantics. */
class PolicyManagerSpec extends AnyFunSuite {

  private def mgr = {
    val m = new PolicyManager
    m.addPolicy(RowFilterPolicy("user_A", "hive", "default", "orders", "region = 'beijing'"))
    m.addPolicy(RowFilterPolicy("user_B", "hive", "default", "orders", "region = 'hangzhou'"))
    m.addPolicy(DataMaskPolicy("user_A", "hive", "default", "orders", "customer_name", "MASK"))
    m.addPolicy(DataMaskPolicy("user_B", "hive", "default", "orders", "customer_name", "MASK_SHOW_FIRST_4"))
    m
  }

  test("row filter lookup matches on user+catalog+db+table") {
    assert(mgr.rowFilterConditions("user_A", "hive", "default", "orders") == Seq("region = 'beijing'"))
    assert(mgr.rowFilterConditions("user_B", "hive", "default", "orders") == Seq("region = 'hangzhou'"))
    assert(mgr.rowFilterConditions("user_C", "hive", "default", "orders").isEmpty)
    assert(mgr.rowFilterConditions("user_A", "hive", "default", "products").isEmpty)
  }

  test("lookup is case-insensitive on identifiers") {
    assert(mgr.rowFilterConditions("USER_A", "HIVE", "DEFAULT", "ORDERS").nonEmpty)
  }

  test("mask lookup resolves the registered mask type") {
    val t = mgr.dataMaskType("user_A", "hive", "default", "orders", "customer_name")
    assert(t.exists(_.name == "MASK"))
    assert(t.flatMap(_.transformerFor("customer_name")).contains("mask(customer_name)"))
    val t2 = mgr.dataMaskType("user_B", "hive", "default", "orders", "customer_name")
    assert(t2.flatMap(_.transformerFor("customer_name"))
      .contains("mask_show_first_n(customer_name, 4, 'x', 'x', 'x', -1, '1')"))
    assert(mgr.dataMaskType("user_A", "hive", "default", "orders", "region").isEmpty)
  }

  test("MASK_NULL and MASK_NONE have no transformer (reference would NPE)") {
    val m = new PolicyManager
    assert(m.getMaskType("MASK_NULL").exists(_.transformer.isEmpty))
    assert(m.getMaskType("MASK_NONE").exists(_.transformer.isEmpty))
  }

  test("removePolicy removes exactly the matching policy") {
    val m = mgr
    val p = RowFilterPolicy("user_A", "hive", "default", "orders", "region = 'beijing'")
    assert(m.removePolicy(p))
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders").isEmpty)
    assert(!m.removePolicy(p))
  }

  test("policies round-trip through JSON export/import") {
    val m = mgr
    val m2 = new PolicyManager
    m2.importJson(m.exportJson())
    assert(m2.rowFilterPolicies == m.rowFilterPolicies)
    assert(m2.dataMaskPolicies == m.dataMaskPolicies)
    intercept[IllegalArgumentException](m2.importJson("""{"rowFilters":[{"username":"x"}]}"""))
    m2.importJson("{}") // both sections optional
  }

  test("a policy with an unregistered mask type fails closed, not unmasked") {
    val m = mgr
    m.addPolicy(DataMaskPolicy("user_X", "hive", "default", "orders", "customer_name", "MASK_NO_SUCH_TYPE"))
    val e = intercept[IllegalStateException](
      m.dataMaskType("user_X", "hive", "default", "orders", "customer_name"))
    assert(e.getMessage.contains("MASK_NO_SUCH_TYPE"))
  }

  test("group policies apply to members only, and membership is live") {
    val m = mgr
    m.addPolicy(RowFilterPolicy("analysts", "hive", "default", "orders", "price < 100"))
    // nobody is in the group yet: the policy is dormant for user_C
    assert(m.rowFilterConditions("user_C", "hive", "default", "orders").isEmpty)
    m.addUserToGroup("user_C", "analysts")
    assert(m.rowFilterConditions("user_C", "hive", "default", "orders") == Seq("price < 100"))
    // group policy composes (ANDs) with the user's own policy
    m.addUserToGroup("User_A", "Analysts") // case-insensitive membership
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders").toSet ==
      Set("region = 'beijing'", "price < 100"))
    m.removeUserFromGroup("user_C", "analysts")
    assert(m.rowFilterConditions("user_C", "hive", "default", "orders").isEmpty)
    assert(m.groupsOf("user_a") == Set("analysts"))
  }

  test("wildcard user and table policies match everyone/everything; AND-composition is additive") {
    val m = mgr
    m.addPolicy(RowFilterPolicy("*", "hive", "default", "orders", "deleted = false"))
    // applies to a user with no policy of their own...
    assert(m.rowFilterConditions("user_Z", "hive", "default", "orders") ==
      Seq("deleted = false"))
    // ...and ANDs with a specific user's policy (fail-closed: both narrow)
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders").toSet ==
      Set("region = 'beijing'", "deleted = false"))
    // wildcard table: one policy covers every table in the db
    m.addPolicy(RowFilterPolicy("user_A", "hive", "default", "*", "tenant = 'acme'"))
    assert(m.rowFilterConditions("user_A", "hive", "default", "products") ==
      Seq("tenant = 'acme'"))
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders").toSet ==
      Set("region = 'beijing'", "deleted = false", "tenant = 'acme'"))
    // '*' never matches as a literal group name
    intercept[IllegalArgumentException](m.addUserToGroup("user_A", "*"))
  }

  test("mask precedence: specific beats group beats wildcard; table-exact beats table-wildcard") {
    val m = new PolicyManager
    m.addUserToGroup("alice", "pii_readers")
    // wildcard baseline: everyone gets MASK_NULL
    m.addPolicy(DataMaskPolicy("*", "hive", "default", "orders", "customer_name", "MASK_NULL"))
    assert(m.dataMaskType("bob", "hive", "default", "orders", "customer_name")
      .exists(_.name == "MASK_NULL"))
    // group beats wildcard
    m.addPolicy(DataMaskPolicy("pii_readers", "hive", "default", "orders", "customer_name", "MASK_SHOW_FIRST_4"))
    assert(m.dataMaskType("alice", "hive", "default", "orders", "customer_name")
      .exists(_.name == "MASK_SHOW_FIRST_4"))
    assert(m.dataMaskType("bob", "hive", "default", "orders", "customer_name")
      .exists(_.name == "MASK_NULL"))
    // user-exact beats group — even when added FIRST among equals and even
    // when it GRANTS more visibility (MASK_NONE): precedence is specificity,
    // not restrictiveness, the Ranger semantics
    m.addPolicy(DataMaskPolicy("alice", "hive", "default", "orders", "customer_name", "MASK_NONE"))
    assert(m.dataMaskType("alice", "hive", "default", "orders", "customer_name")
      .exists(_.name == "MASK_NONE"))
    // table-exact beats table-wildcard at equal user specificity
    m.addPolicy(DataMaskPolicy("carol", "hive", "default", "*", "customer_name", "MASK_HASH"))
    m.addPolicy(DataMaskPolicy("carol", "hive", "default", "orders", "customer_name", "MASK"))
    assert(m.dataMaskType("carol", "hive", "default", "orders", "customer_name")
      .exists(_.name == "MASK"))
    assert(m.dataMaskType("carol", "hive", "default", "products", "customer_name")
      .exists(_.name == "MASK_HASH"))
    // adversarial: the wildcard-user policy must NOT shadow a group policy
    // added later (rank decides, not order)
    val m2 = new PolicyManager
    m2.addUserToGroup("dave", "g1")
    m2.addPolicy(DataMaskPolicy("g1", "hive", "default", "t", "c", "MASK"))
    m2.addPolicy(DataMaskPolicy("*", "hive", "default", "t", "c", "MASK_NULL"))
    assert(m2.dataMaskType("dave", "hive", "default", "t", "c").exists(_.name == "MASK"))
    // insertion order breaks full ties
    val m3 = new PolicyManager
    m3.addPolicy(DataMaskPolicy("eve", "hive", "default", "t", "c", "MASK_HASH"))
    m3.addPolicy(DataMaskPolicy("eve", "hive", "default", "t", "c", "MASK"))
    assert(m3.dataMaskType("eve", "hive", "default", "t", "c").exists(_.name == "MASK_HASH"))
  }

  test("groups round-trip through JSON export/import") {
    val m = new PolicyManager
    m.addUserToGroup("alice", "analysts")
    m.addUserToGroup("bob", "analysts")
    m.addPolicy(RowFilterPolicy("analysts", "hive", "default", "orders", "x = 1"))
    val m2 = new PolicyManager
    m2.importJson(m.exportJson())
    assert(m2.groupsOf("alice") == Set("analysts"))
    assert(m2.rowFilterConditions("bob", "hive", "default", "orders") == Seq("x = 1"))
  }

  test("removePolicy matches identifiers case-insensitively, like lookups") {
    val m = mgr
    assert(m.removePolicy(RowFilterPolicy("USER_A", "Hive", "Default", "ORDERS", "region = 'beijing'")))
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders").isEmpty)
    assert(m.removePolicy(DataMaskPolicy("User_B", "HIVE", "default", "Orders", "CUSTOMER_NAME", "mask_show_first_4")))
    assert(m.dataMaskType("user_B", "hive", "default", "orders", "customer_name").isEmpty)
    // the condition text itself is NOT an identifier: it stays case-sensitive
    assert(!m.removePolicy(RowFilterPolicy("user_B", "hive", "default", "orders", "REGION = 'hangzhou'")))
    assert(m.rowFilterConditions("user_B", "hive", "default", "orders").nonEmpty)
  }

  test("deny overrides allow at every specificity; matching is rank-based") {
    val m = mgr
    // adversarial: the deny is the LEAST specific principal ('*') and the
    // allow is the MOST specific (exact user) — deny must still win
    m.addPolicy(DenyRowPolicy("*", "hive", "default", "orders"))
    assert(m.isDenied("user_A", "hive", "default", "orders"))
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders") == Seq("false"))
    // other tables unaffected
    assert(!m.isDenied("user_A", "hive", "default", "customer"))
    // group-scoped deny hits members only
    val m2 = new PolicyManager
    m2.addUserToGroup("carol", "contractors")
    m2.addPolicy(DenyRowPolicy("contractors", "hive", "default", "orders"))
    assert(m2.isDenied("carol", "hive", "default", "orders"))
    assert(!m2.isDenied("dave", "hive", "default", "orders"))
    // removal restores the allow-filter path
    assert(m.removePolicy(DenyRowPolicy("*", "hive", "default", "orders")))
    assert(m.rowFilterConditions("user_A", "hive", "default", "orders") == Seq("region = 'beijing'"))
  }

  test("validity windows: [from, until) against the injectable clock, all policy kinds") {
    val m = new PolicyManager
    m.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "expired = 1",
      validUntil = Some("2026-01-01T00:00:00Z")))
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "future = 1",
      validFrom = Some("2027-01-01T00:00:00Z")))
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "active = 1",
      validFrom = Some("2026-01-01T00:00:00Z"), validUntil = Some("2027-01-01T00:00:00Z")))
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("active = 1"))
    // inclusive start, exclusive end
    m.clock = () => java.time.Instant.parse("2026-01-01T00:00:00Z")
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("active = 1"))
    m.clock = () => java.time.Instant.parse("2027-01-01T00:00:00Z")
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("future = 1"))
    // an expired deny stops denying; an active one wins over everything
    m.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    m.addPolicy(DenyRowPolicy("u", "hive", "default", "t",
      validUntil = Some("2026-06-01T00:00:00Z")))
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("active = 1"))
    m.addPolicy(DenyRowPolicy("u", "hive", "default", "t",
      validFrom = Some("2026-06-01T00:00:00Z")))
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("false"))
    // windowed masks deactivate outside the window
    val mm = new PolicyManager
    mm.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    mm.addPolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK_HASH",
      validUntil = Some("2026-01-01T00:00:00Z")))
    assert(mm.dataMaskType("u", "hive", "default", "t", "c").isEmpty)
    assert(!mm.hasDataMask("u", "hive", "default", "t"))
    mm.addPolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validFrom = Some("2026-01-01T00:00:00Z")))
    assert(mm.dataMaskType("u", "hive", "default", "t", "c").exists(_.name == "MASK"))
    // malformed window fails loudly, never silently inactive
    mm.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "x = 1",
      validFrom = Some("not-a-timestamp")))
    intercept[java.time.format.DateTimeParseException] {
      mm.rowFilterConditions("u", "hive", "default", "t")
    }
  }

  test("denies and windows round-trip through JSON export/import") {
    val m = new PolicyManager
    m.addPolicy(DenyRowPolicy("eve", "hive", "default", "orders",
      validFrom = Some("2026-01-01T00:00:00Z"), validUntil = Some("2027-01-01T00:00:00Z")))
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "x = 1",
      validUntil = Some("2030-01-01T00:00:00Z")))
    m.addPolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validFrom = Some("2020-01-01T00:00:00Z")))
    val m2 = new PolicyManager
    m2.importJson(m.exportJson())
    assert(m2.denyPolicies == m.denyPolicies)
    assert(m2.rowFilterPolicies == m.rowFilterPolicies)
    assert(m2.dataMaskPolicies == m.dataMaskPolicies)
    m2.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    assert(m2.isDenied("eve", "hive", "default", "orders"))
    m2.clock = () => java.time.Instant.parse("2027-06-15T12:00:00Z")
    assert(!m2.isDenied("eve", "hive", "default", "orders"))
  }

  test("column deny: lookup, wildcards, groups, windows, removal") {
    val m = new PolicyManager
    // exact-user deny on one column
    m.addPolicy(ColumnDenyPolicy("user_A", "hive", "default", "orders", "price"))
    assert(m.deniedColumns("user_A", "hive", "default", "orders") == Seq("price"))
    // other users / tables unaffected; matching is case-insensitive
    assert(m.deniedColumns("user_B", "hive", "default", "orders").isEmpty)
    assert(m.deniedColumns("user_A", "hive", "default", "customer").isEmpty)
    assert(m.deniedColumns("USER_A", "HIVE", "DEFAULT", "ORDERS") == Seq("price"))
    // wildcard principal AND wildcard table both match (adversarial: the
    // least specific deny still denies — deny has no specificity ladder)
    m.addPolicy(ColumnDenyPolicy("*", "hive", "default", "*", "ssn"))
    assert(m.deniedColumns("user_B", "hive", "default", "anything").contains("ssn"))
    // group-scoped deny hits members only
    m.addUserToGroup("carol", "contractors")
    m.addPolicy(ColumnDenyPolicy("contractors", "hive", "default", "orders", "margin"))
    assert(m.deniedColumns("carol", "hive", "default", "orders").contains("margin"))
    assert(!m.deniedColumns("dave", "hive", "default", "orders").contains("margin"))
    // windows gate the deny like every policy kind
    m.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    m.addPolicy(ColumnDenyPolicy("user_A", "hive", "default", "orders", "cost",
      validUntil = Some("2026-01-01T00:00:00Z")))
    assert(!m.deniedColumns("user_A", "hive", "default", "orders").contains("cost"))
    // removal matches windows too (the renewal flow: two identical policies
    // differing only in window must be individually removable)
    m.addPolicy(ColumnDenyPolicy("user_A", "hive", "default", "orders", "price",
      validFrom = Some("2026-01-01T00:00:00Z")))
    assert(m.removePolicy(ColumnDenyPolicy("user_A", "hive", "default", "orders", "price")))
    assert(m.deniedColumns("user_A", "hive", "default", "orders").contains("price"),
      "removal must take the unwindowed policy, leaving the windowed renewal active")
  }

  test("removePolicy matches validity windows for row filters and masks (renewal flow)") {
    val m = new PolicyManager
    m.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    // two row filters identical except window: expired original + active renewal
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "x = 1",
      validUntil = Some("2026-01-01T00:00:00Z")))
    m.addPolicy(RowFilterPolicy("u", "hive", "default", "t", "x = 1",
      validFrom = Some("2026-01-01T00:00:00Z")))
    // removing the EXPIRED one must not delete the active renewal
    assert(m.removePolicy(RowFilterPolicy("u", "hive", "default", "t", "x = 1",
      validUntil = Some("2026-01-01T00:00:00Z"))))
    assert(m.rowFilterConditions("u", "hive", "default", "t") == Seq("x = 1"))
    // same for masks
    m.addPolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validUntil = Some("2026-01-01T00:00:00Z")))
    m.addPolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validFrom = Some("2026-01-01T00:00:00Z")))
    assert(m.removePolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validUntil = Some("2026-01-01T00:00:00Z"))))
    assert(m.dataMaskType("u", "hive", "default", "t", "c").exists(_.name == "MASK"))
    // a remove naming a window no stored policy has matches nothing
    assert(!m.removePolicy(DataMaskPolicy("u", "hive", "default", "t", "c", "MASK",
      validUntil = Some("2031-01-01T00:00:00Z"))))
  }

  test("column denies round-trip through JSON export/import") {
    val m = new PolicyManager
    m.addPolicy(ColumnDenyPolicy("eve", "hive", "default", "orders", "price",
      validFrom = Some("2026-01-01T00:00:00Z"), validUntil = Some("2027-01-01T00:00:00Z")))
    m.addPolicy(ColumnDenyPolicy("*", "hive", "default", "*", "ssn"))
    val m2 = new PolicyManager
    m2.importJson(m.exportJson())
    assert(m2.columnDenyPolicies == m.columnDenyPolicies)
    m2.clock = () => java.time.Instant.parse("2026-06-15T12:00:00Z")
    assert(m2.deniedColumns("eve", "hive", "default", "orders").sorted == Seq("price", "ssn"))
    m2.clock = () => java.time.Instant.parse("2027-06-15T12:00:00Z")
    assert(m2.deniedColumns("eve", "hive", "default", "orders") == Seq("ssn"))
  }
}
