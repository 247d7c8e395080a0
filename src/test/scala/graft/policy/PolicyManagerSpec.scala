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
}
