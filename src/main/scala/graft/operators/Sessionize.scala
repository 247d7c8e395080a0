package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream.
  *
  * Batch form: two window passes per user partition (lag to detect gaps,
  * running sum to number sessions) — one shuffle on the user key, linear in
  * events; session boundaries use second-truncated epochs so batch results
  * are engine-portable for the oracle.
  *
  * Streaming form: KeyValueGroupedDataset.flatMapGroupsWithState with an
  * explicit open-session state per user — the Structured Streaming analog of
  * Flink's keyed session state; closed sessions are emitted per micro-batch.
  */
object Sessionize extends Serializable {

  /** assign() plus the second-truncated epoch helper column `_te`, for
    * internal consumers (sessions) that aggregate over it.
    */
  private def assignWithEpoch(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val te = unix_timestamp(col(tsCol))
    val prev = lag(te, 1).over(byUser)
    events
      .withColumn("_te", te)
      .withColumn("_is_new",
        when(prev.isNull || (te - prev) > gapSeconds, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("_is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_is_new")
  }

  /** Assign per-user session sequence numbers: a new session starts when the
    * gap since the previous event exceeds `gapSeconds`. Output schema is the
    * input schema plus `session_seq` — no internal helper columns leak.
    */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    assignWithEpoch(events, userCol, tsCol, gapSeconds).drop("_te")

  /** Batch session summary: (user, session_seq, n_events, start, end). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame =
    assignWithEpoch(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_te")).as("session_start"),
        max(col("_te")).as("session_end"))
      .orderBy(col(userCol), col("session_seq"))

  case class SessionEvent(userId: Long, epochSec: Long)
  /** [[SessionEvent]] plus the watermarked event-time column — the analyzer
    * requires an event-time attribute in the grouped input's schema for
    * EventTimeTimeout, and watermark metadata lives on the column itself.
    */
  case class SessionEventT(userId: Long, epochSec: Long, ets: java.sql.Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class ClosedSession(userId: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long)

  /** Fold a sorted batch of event times into the per-user session state:
    * returns the sessions closed by gap during this batch and the surviving
    * open session. Shared by both streaming variants.
    */
  private def foldSessions(userId: Long, sorted: Array[Long],
      init: Option[OpenSession], gapSeconds: Long)
      : (Seq[ClosedSession], Option[OpenSession]) = {
    val closed = Seq.newBuilder[ClosedSession]
    var cur = init
    sorted.foreach { t =>
      cur match {
        case Some(s) if t - s.end <= gapSeconds =>
          // max: a late (cross-batch out-of-order) event must not move the
          // session end backwards — that would both corrupt this session's
          // boundary and mis-split the next one
          cur = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
        case Some(s) =>
          closed += ClosedSession(userId, s.start, s.end, s.n)
          cur = Some(OpenSession(t, t, 1))
        case None =>
          cur = Some(OpenSession(t, t, 1))
      }
    }
    (closed.result(), cur)
  }

  /** Streaming sessionizer: keeps one open session per user in group state,
    * closes it when an incoming event exceeds the gap. The trailing open
    * session stays in state (a wall-clock timeout here would make synchronous
    * test drains wait out the gap in real time); use
    * [[streamingSessionsFlushed]] when trailing sessions must be emitted.
    */
  def streamingSessions(spark: SparkSession, events: DataFrame, userCol: String,
      tsCol: String, gapSeconds: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    val typed = events
      .select(col(userCol).cast("long").as("userId"),
        unix_timestamp(col(tsCol)).as("epochSec"))
      .as[SessionEvent]

    def fn(userId: Long, evs: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val (closed, cur) =
        foldSessions(userId, evs.map(_.epochSec).toArray.sorted, state.getOption, gapSeconds)
      cur.foreach(state.update)
      closed.iterator
    }

    typed.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fn)
  }

  /** Streaming sessionizer that ALSO flushes trailing sessions: an event-time
    * timeout closes each user's open session once the watermark passes
    * `session_end + gapSeconds`. As the watermark advances past every open
    * session, output converges to the batch [[sessions]] result — state is
    * bounded by (open sessions × users), freed at timeout.
    *
    * `watermarkDelay` is the out-of-orderness bound: events later than it are
    * dropped by the watermark, so pick it >= the source's real disorder.
    */
  def streamingSessionsFlushed(spark: SparkSession, events: DataFrame,
      userCol: String, tsCol: String, gapSeconds: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import spark.implicits._
    val typed = events
      .withColumn("_ets", col(tsCol).cast("timestamp"))
      .withWatermark("_ets", watermarkDelay)
      .select(col(userCol).cast("long").as("userId"),
        unix_timestamp(col("_ets")).as("epochSec"),
        col("_ets").as("ets")) // carries the watermark metadata through
      .as[SessionEventT]

    def fn(userId: Long, evs: Iterator[SessionEventT],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(userId, s.start, s.end, s.n))
      } else {
        val (closed, cur) =
          foldSessions(userId, evs.map(_.epochSec).toArray.sorted, state.getOption, gapSeconds)
        cur.foreach { s =>
          state.update(s)
          // flush once the watermark passes the gap after the session end;
          // clamp above the current watermark — setTimeoutTimestamp rejects
          // timestamps the watermark has already passed (a late session must
          // still get a valid next-batch flush, not an exception)
          state.setTimeoutTimestamp(math.max(
            (s.end + gapSeconds) * 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
        }
        closed.iterator
      }
    }

    typed.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Ordered event funnel — the match_recognize-class question "who did
    * stage 1, THEN stage 2, THEN stage 3" asked declaratively: per user,
    * stage k's timestamp is the EARLIEST event of `stages(k-1)`'s type
    * STRICTLY after the user's stage k-1 timestamp (earliest-qualifying
    * semantics — deterministic, and the standard funnel definition). Output
    * one row per user who entered the funnel: (userCol, ts_1..ts_k as epoch
    * seconds, stage_reached); later stages are NULL once the chain breaks.
    *
    * Shape at scale: NO per-user ordering window anywhere — each stage is
    * one equi-join on the user key plus a min aggregate (map-side partial),
    * so k stages cost k user-keyed shuffles that AQE plans off the same
    * exchange, and a hot user contributes counts, never a sort. This is
    * the funnel at 100 TB of events: the per-stage filter prunes to that
    * stage's type before anything shuffles.
    *
    * The accumulation is one LEFT JOIN per stage onto the per-user frame —
    * a k-join plan. That is the right trade for product funnels (k <= ~10:
    * each join is user-keyed on an already-reduced frame, and every stage
    * is prunable to its own event type before shuffling). It is NOT the
    * shape for large k: at k in the hundreds the join chain's plan depth
    * and repeated user-keyed exchanges dominate, and a single conditional
    * aggregate over type-tagged events (one shuffle, per-user state = k
    * timestamps) wins — if you need a 100-stage "funnel" you are really
    * sessionizing; use [[sessionize]] / [[sessionizeStream]] instead.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      windowSeconds: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val te = unix_timestamp(col(tsCol))
    // cur carries (user, ts_1, ts of the latest stage): ts_1 is the funnel
    // ENTRY, against which the conversion window is measured — the
    // standard product definition; Long.MaxValue disables the bound
    var cur = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(te).as("ts_1"))
    var out = cur
    for (i <- 2 to stages.size) {
      val inWindow =
        if (windowSeconds == Long.MaxValue) lit(true)
        else col("_t") <= col("ts_1") + windowSeconds
      val nxt = events.filter(col(typeCol) === stages(i - 1))
        .select(col(userCol), te.as("_t"))
        .join(cur, Seq(userCol))
        .filter(col("_t") > col(s"ts_${i - 1}") && inWindow)
        .groupBy(col(userCol))
        // ts_1 is constant per user; min() just carries it through the agg
        .agg(min(col("_t")).as(s"ts_$i"), min(col("ts_1")).as("ts_1"))
      out = out.join(nxt.select(col(userCol), col(s"ts_$i")),
        Seq(userCol), "left")
      cur = nxt.select(col(userCol), col("ts_1"), col(s"ts_$i"))
    }
    // ascending fold so the HIGHEST reached stage's check ends up outermost
    val reached = (2 to stages.size).foldLeft(lit(1)) { (acc, i) =>
      when(col(s"ts_$i").isNotNull, i).otherwise(acc)
    }
    out.withColumn("stage_reached", reached)
  }

  /** The headline numbers over [[funnel]]: users reaching each stage and
    * the step conversion rate — one bounded k-row aggregate over the
    * per-user funnel.
    */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String],
      windowSeconds: Long = Long.MaxValue): DataFrame = {
    val f = funnel(events, userCol, typeCol, tsCol, stages, windowSeconds)
    val aggs = count(lit(1)).as("n_1") +:
      (2 to stages.size).map(i => count(col(s"ts_$i")).as(s"n_$i"))
    val counts = f.agg(aggs.head, aggs.tail: _*)
    counts.select(explode(array((1 to stages.size).map { i =>
        val conv =
          if (i == 1) lit(1.0)
          else when(col(s"n_${i - 1}") > 0,
            round(col(s"n_$i").cast("double") /
              col(s"n_${i - 1}").cast("double"), 6))
            .otherwise(lit(null).cast("double")) // an empty prior stage has no rate
        struct(lit(i).as("stage"), lit(stages(i - 1)).as("event_type"),
          col(s"n_$i").as("n_users"), conv.as("conversion"))
      }: _*)).as("s"))
      .select(col("s.stage"), col("s.event_type"), col("s.n_users"),
        col("s.conversion"))
  }

  /** Cohort retention matrix — the other standard product-analytics read
    * over an event log (the funnel asks "who progressed", this asks "who
    * came back"): users cohorted by the period of their FIRST event, one
    * row per (cohort, period_offset) with the count of cohort members
    * active in that period. `period` is "week" (Monday-aligned, the
    * default) or "day".
    *
    * Two aggregates and a user-keyed join, nothing event-sized after the
    * first map: the (user, period) activity table is `distinct`-collapsed
    * map-side before the join, the first-event table is one min-aggregate
    * per user, both shuffles are user-keyed so AQE plans the join off the
    * same exchange, and the final matrix aggregate is |cohorts| x
    * |offsets| rows. A hot user contributes one row per active period,
    * never a sort. Both engines truncate weeks to Monday, so the matrix
    * is engine-portable (oracled in `events_retention`).
    */
  def retentionMatrix(events: DataFrame, userCol: String, tsCol: String,
      period: String = "week"): DataFrame = {
    val perDays = period match {
      case "week" => 7
      case "day" => 1
      case other => throw new IllegalArgumentException(
        s"retention period must be 'week' or 'day', got $other")
    }
    val bucket = to_date(date_trunc(period, col(tsCol)))
    val firstP = events.groupBy(col(userCol)).agg(min(bucket).as("cohort"))
    val active = events.select(col(userCol), bucket.as("_p")).distinct()
    active.join(firstP, Seq(userCol))
      .groupBy(col("cohort"),
        (datediff(col("_p"), col("cohort")) / lit(perDays)).cast("int")
          .as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
