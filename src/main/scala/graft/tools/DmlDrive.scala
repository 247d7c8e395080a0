package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for row-level DML on the memory catalog (not part of the API). */
object DmlDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft_mem", classOf[graft.sources.GraftMemoryCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftMemoryCatalog.clear()
    spark.sql("CREATE TABLE graft_mem.default.t (k BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO graft_mem.default.t VALUES (1,'a',10),(2,'b',20),(3,'c',30),(4,'d',40)")
    println("== parsed DELETE plan ==")
    println(spark.sessionState.sqlParser.parsePlan("DELETE FROM graft_mem.default.t WHERE k = 4"))
    println("== analyzed DELETE plan ==")
    val del = spark.sessionState.sqlParser.parsePlan("DELETE FROM graft_mem.default.t WHERE k = 4")
    println(spark.sessionState.executePlan(del).analyzed)
    println("== DELETE ==")
    spark.sql("DELETE FROM graft_mem.default.t WHERE k = 4")
    spark.sql("SELECT * FROM graft_mem.default.t ORDER BY k").show()
    println("== analyzed UPDATE plan ==")
    println(spark.sessionState.executePlan(spark.sessionState.sqlParser.parsePlan(
      "UPDATE graft_mem.default.t SET n = n + 100 WHERE k >= 2")).analyzed)
    println("== UPDATE ==")
    spark.sql("UPDATE graft_mem.default.t SET n = n + 100 WHERE k >= 2")
    spark.sql("SELECT * FROM graft_mem.default.t ORDER BY k").show()
    println("== MERGE ==")
    spark.sql("CREATE TABLE graft_mem.default.s (k BIGINT, v STRING, n BIGINT)")
    spark.sql("INSERT INTO graft_mem.default.s VALUES (3,'C',300),(9,'Z',900)")
    println("== parsed MERGE plan ==")
    println(spark.sessionState.sqlParser.parsePlan(
      """MERGE INTO graft_mem.default.t AS t USING graft_mem.default.s AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)""".stripMargin))
    println(spark.sessionState.executePlan(spark.sessionState.sqlParser.parsePlan(
      """MERGE INTO graft_mem.default.t AS t USING graft_mem.default.s AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)""".stripMargin)).analyzed)
    spark.sql(
      """MERGE INTO graft_mem.default.t AS t USING graft_mem.default.s AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)""".stripMargin)
    spark.sql("SELECT * FROM graft_mem.default.t ORDER BY k").show()
    spark.stop()
  }
}
// appended scratch: secured DML drive
object DmlSecDrive {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft_mem", classOf[graft.sources.GraftMemoryCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftMemoryCatalog.clear()
    spark.sql("CREATE TABLE graft_mem.default.acct (k BIGINT, seg STRING, bal BIGINT)")
    spark.sql("INSERT INTO graft_mem.default.acct VALUES (1,'A',10),(2,'B',20),(3,'A',30),(4,'B',40)")
    spark.sql("CREATE TABLE graft_mem.default.chg (k BIGINT, seg STRING, bal BIGINT)")
    spark.sql("INSERT INTO graft_mem.default.chg VALUES (2,'B',200),(3,'A',300),(9,'Zed1',900)")
    val ctx = new graft.SecurityContext(spark)
    ctx.policyManager.addPolicy(graft.policy.RowFilterPolicy(
      "analyst", "graft_mem", "default", "acct", "seg = 'A'"))
    ctx.policyManager.addPolicy(graft.policy.DataMaskPolicy(
      "analyst", "graft_mem", "default", "chg", "seg", "MASK"))
    println("== secured UPDATE (only seg='A' rows touchable) ==")
    ctx.executeDml("analyst", "UPDATE graft_mem.default.acct SET bal = bal + 1000 WHERE bal >= 20")
    spark.sql("SELECT * FROM graft_mem.default.acct ORDER BY k").show()
    println("== secured MERGE (matched update constrained; source seg masked on insert) ==")
    ctx.executeDml("analyst",
      """MERGE INTO graft_mem.default.acct AS t USING graft_mem.default.chg AS s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET bal = s.bal
        |WHEN NOT MATCHED THEN INSERT (k, seg, bal) VALUES (s.k, s.seg, s.bal)""".stripMargin)
    spark.sql("SELECT * FROM graft_mem.default.acct ORDER BY k").show()
    println("== secured DELETE ==")
    ctx.executeDml("analyst", "DELETE FROM graft_mem.default.acct WHERE bal >= 30")
    spark.sql("SELECT * FROM graft_mem.default.acct ORDER BY k").show()
    println("== audit ==")
    ctx.auditLog.show(100, false)
    println("== deny fails closed ==")
    ctx.policyManager.addPolicy(graft.policy.DenyRowPolicy(
      "analyst", "graft_mem", "default", "acct"))
    try { ctx.executeDml("analyst", "DELETE FROM graft_mem.default.acct WHERE k = 1"); println("NO-THROW (BAD)") }
    catch { case e: Exception => println("threw: " + e.getMessage.take(100)) }
    spark.stop()
  }
}
