package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock breakdown of one SparkEntry query (optimization-guide
  * §1: decide where the time goes before touching anything). Runs the query
  * twice (cold then warm) with a listener recording every job's duration and
  * description, and prints the warm run's job table plus the gap between
  * summed job time and end-to-end wall time (the driver-side/planning
  * residue).
  *
  * Usage: runMain graft.tools.JobProfile <query>[,<query>...] [dir]
  */
object JobProfile {
  private case class Job(id: Int, desc: String, ms: Long, startMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query,...> [dir]")
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // ad-hoc A/B hook: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    graft.streaming.StreamOps.configureDrainFor(spark, dir)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobOfStage = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val stagesOfJob = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[String]]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    val sqlExecs = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val execOfJob = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (desc, js.time))
        Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .foreach(id => execOfJob.put(js.jobId, id.toLong))
        js.stageInfos.foreach(si => jobOfStage.put(si.stageId, js.jobId))
        stagesOfJob.put(js.jobId,
          java.util.Collections.synchronizedList(new java.util.ArrayList[String]()))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        Option(jobOfStage.get(si.stageId)).foreach { jid =>
          val ms = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          val run = si.taskMetrics.executorRunTime
          Option(stagesOfJob.get(jid)).foreach(_.add(
            f"stage ${si.stageId}: ${ms}ms wall, ${si.numTasks} tasks, ${run}ms taskRun, ${si.name.take(80)}"))
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          done.add(Job(je.jobId, desc, je.time - t0, t0))
        }
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            sqlExecs.put(s.executionId, s.physicalPlanDescription)
          case _ => ()
        }
    }

    def runOnce(name: String, record: Boolean): Double = {
      if (record) { done.clear(); spark.sparkContext.addSparkListener(listener) }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      if (record) {
        // listener events are posted asynchronously; give the bus a moment
        // to drain before reading the table (probe-only tool, sleep is fine)
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      graft.streaming.StreamOps.dropDrainResidue(spark)
      System.gc()
      sec
    }

    names.foreach { name =>
      val cold = runOnce(name, record = false)
      val warm = runOnce(name, record = true)
      val all = {
        import scala.jdk.CollectionConverters._
        done.iterator().asScala.toSeq.sortBy(_.id)
      }
      println(f"\n===== $name cold=$cold%.2f s warm=$warm%.2f s jobs=${all.size} jobSum=${all.map(_.ms).sum / 1e3}%.2f s =====")
      val slowCut = sys.env.getOrElse("SPARK_GRAFT_PROFILE_SLOW_MS", "150").toLong
      // start offsets expose serialization vs overlap between jobs (two
      // jobs submitted "concurrently" should show near-equal offsets)
      val epoch = if (all.isEmpty) 0L else all.map(_.startMs).min
      all.foreach { j =>
        println(f"  job ${j.id}%4d +${(j.startMs - epoch) / 1e3}%7.2f ${j.ms}%6d ms  ${j.desc.take(110)}")
        if (j.ms >= slowCut) {
          import scala.jdk.CollectionConverters._
          Option(stagesOfJob.get(j.id)).foreach(_.asScala.foreach(s =>
            println(s"        $s")))
          Option(execOfJob.get(j.id)).flatMap(id => Option(sqlExecs.get(id)))
            .foreach { plan =>
              println("        -- SQL plan (head) --")
              plan.linesIterator.take(sys.env.getOrElse("SPARK_GRAFT_PROFILE_PLAN_LINES", "12").toInt).foreach(l => println(s"        | $l"))
            }
        }
      }
      jobOfStage.clear(); stagesOfJob.clear()
    }
    spark.stop()
  }
}
