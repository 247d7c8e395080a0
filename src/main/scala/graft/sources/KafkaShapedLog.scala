package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A file-backed streaming source in KAFKA'S RECORD SHAPE — the offline
  * stand-in for the reference's live CDC connector ingestion
  * (AbstractBasicTest.java:167-234 registers every table as a `mysql-cdc`
  * stream; Debezium-over-Kafka is the standard transport for that log).
  *
  * The sandbox has no Kafka broker and no spark-sql-kafka connector jar, so
  * the honest closable gap is the SCHEMA CONTRACT: everything downstream of
  * the source — envelope decode, changelog mapping, the whole IVM family —
  * is written against the exact 7-column record schema Spark's Kafka source
  * emits ([[schema]]). Swapping in the real thing is then one line:
  *
  *   spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", ...).option("subscribe", topic)
  *     .load()            // same columns, same types
  *
  * replaces [[readStream]], and nothing downstream changes. A contract spec
  * (StreamingSpec) pins this source's schema to the connector's documented
  * output so drift fails loudly.
  *
  * Scale note: the file-backed form is for tests and replay; the decode and
  * maintenance stages it feeds are the scale path (change-sized shuffles,
  * persisted bucketed state — see [[graft.operators.ChangeLog]]).
  */
object KafkaShapedLog {

  /** Exactly the Spark Kafka source's output schema (Structured Streaming
    * + Kafka Integration Guide, "Each row in the source has the following
    * schema"): key/value binary, topic string, partition int, offset long,
    * timestamp, timestampType int.
    */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Append one SEGMENT (one micro-batch worth of records) to the log
    * directory: rows become Kafka-shaped records — key = UTF-8 of `keyExpr`,
    * value = UTF-8 JSON of the full row (the flat Debezium-style envelope),
    * offsets dense per segment in the input's sort order, timestamps a
    * deterministic function of (base, segment). Files are mtime-ordered so
    * a maxFilesPerTrigger=1 reader replays segments in append order, the
    * way a Kafka consumer sees a partition.
    */
  def appendSegment(df: DataFrame, dir: String, topic: String, segment: Int,
      keyCol: String, orderCols: Seq[String],
      baseEpochMs: Long = 1700000000000L): Unit = {
    val logDir = new java.io.File(dir)
    logDir.mkdirs()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(orderCols.map(col): _*)
    val records = df
      .withColumn("key", encode(col(keyCol).cast("string"), "UTF-8"))
      .withColumn("value", encode(
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)), "UTF-8"))
      .withColumn("topic", lit(topic))
      .withColumn("partition", lit(0))
      .withColumn("offset",
        row_number().over(w).cast("long") - 1 + lit(segment.toLong) * 1000000L)
      .withColumn("timestamp",
        timestamp_millis(lit(baseEpochMs + segment * 60000L)))
      .withColumn("timestampType", lit(0))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val tmp = new java.io.File(logDir.getParentFile,
      s".${logDir.getName}_seg$segment")
    records.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(logDir, f"segment-$segment%05d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(baseEpochMs + segment * 60000L)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(); ()
    }
    rmrf(tmp)
  }

  /** `readStream` over the log directory, one segment per micro-batch by
    * default — the drop-in for `spark.readStream.format("kafka")...load()`
    * (same output schema, segment order standing in for offset order).
    */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(dir)

  /** Decode the value envelope back to typed columns — the standard
    * `CAST(value AS STRING)` + `from_json` consumer idiom, exact for the
    * integral/string/boolean types the changelog family carries (no
    * doubles ride the envelope, so JSON round-tripping is lossless).
    * Output columns are `valueSchema`'s, plus the record timestamp as
    * `_kafka_ts` for event-time consumers.
    */
  def decodeJson(log: DataFrame, valueSchema: StructType): DataFrame =
    log.select(
        from_json(col("value").cast("string"), valueSchema).as("_v"),
        col("timestamp").as("_kafka_ts"))
      .select((valueSchema.fieldNames.map(n => col(s"_v.$n")) :+
        col("_kafka_ts")).toIndexedSeq: _*)

  /** Debezium's change-event value envelope for a row image type `row`
    * (the UNWRAPPED payload form every Debezium connector documents):
    * before/after images, op code `c|u|d|r`, source metadata, ts_ms. This
    * is what the reference's mysql-cdc tables actually carry on the wire —
    * the flat [[decodeJson]] envelope is the post-ExtractNewRecordState
    * shape; this one is the raw connector output.
    */
  def debeziumValueSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", StructType(Seq(
      StructField("connector", StringType),
      StructField("db", StringType),
      StructField("table", StringType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    // the envelope's schema block, reduced to what consumers need from it:
    // the authoritative list of row-image field names AT EMIT TIME. The
    // full Kafka Connect JSON block carries per-field types too; names are
    // what schema-evolution consumers key on (a column absent from `fields`
    // did not exist yet — distinguishable from "present but null", which
    // to_json's null-dropping otherwise erases). Optional: events from
    // schema-less producers decode with fields = null.
    StructField("fields", ArrayType(StringType))))

  /** Encode a [[graft.operators.ChangeLog.fromSnapshotsFull]] changelog —
    * rows `(key, op I|U|D, <c>_before..., <c>_after...)` — as Debezium
    * change events: op I -> "c" (before null), U -> "u" (both images),
    * D -> "d" (after null); each image carries the key column like the
    * real connector's row images do. Feed the result to [[appendSegment]]
    * (whose value json then IS a Debezium event) with `keyCol` and
    * `orderCols = Seq(keyCol, "op")`.
    */
  def encodeDebezium(changes: DataFrame, keyCol: String,
      valueCols: Seq[String], db: String, table: String,
      tsMs: Long = 1700000000000L): DataFrame = {
    val beforeImg = struct(col(keyCol) +:
      valueCols.map(c => col(s"${c}_before").as(c)): _*)
    val afterImg = struct(col(keyCol) +:
      valueCols.map(c => col(s"${c}_after").as(c)): _*)
    changes.select(
      col(keyCol),
      when(col("op") =!= "I", beforeImg).as("before"),
      when(col("op") =!= "D", afterImg).as("after"),
      struct(lit("mysql").as("connector"), lit(db).as("db"),
        lit(table).as("table")).as("source"),
      when(col("op") === "I", "c").when(col("op") === "U", "u")
        .otherwise("d").as("op"),
      lit(tsMs).as("ts_ms"),
      // schema block: the row-image field list as of THIS emit — consumers
      // detect mid-log DDL (column added/dropped) from changes in this list
      array((keyCol +: valueCols).map(lit(_)): _*).as("fields"))
  }

  /** Decode Debezium change events back into the changelog shape the IVM
    * family consumes: `(key, op I|U|D, <c>_before..., <c>_after...)`.
    * Snapshot reads (op "r" — Debezium's initial-load records) map to I,
    * exactly how a consumer bootstraps standing state from the connector's
    * snapshot phase. `rowSchema` is the row image type (key + value
    * columns with their pre-encode types).
    */
  def decodeDebezium(log: DataFrame, rowSchema: StructType,
      keyCol: String, extraCols: Seq[String] = Nil): DataFrame = {
    val valueCols = rowSchema.fieldNames.filterNot(_ == keyCol).toSeq
    val env = from_json(col("value").cast("string"),
      debeziumValueSchema(rowSchema))
    log.select(env.as("_e") +: extraCols.map(col): _*)
      // row changes ONLY: a real stream also carries truncates ('t') and
      // heartbeat/info messages ('m'), which have no row images — mapping
      // them to anything would fabricate deletes with null keys
      .filter(col("_e.op").isin("c", "r", "u", "d"))
      .select(
        coalesce(col(s"_e.after.$keyCol"), col(s"_e.before.$keyCol"))
          .as(keyCol) +:
        when(col("_e.op").isin("c", "r"), "I")
          .when(col("_e.op") === "u", "U")
          .otherwise("D").as("op") +:
        (valueCols.map(c => col(s"_e.before.$c").as(s"${c}_before")) ++
          valueCols.map(c => col(s"_e.after.$c").as(s"${c}_after")) ++
          extraCols.map(col)): _*)
  }

  /** The DISTINCT `fields` lists present in a (micro-)batch of Debezium
    * records — the per-batch schema-discovery step of an evolving consumer.
    * Bounded by construction: a batch spans at most a handful of schema
    * epochs (one list per DDL, identical across the records between DDLs),
    * so the collect is epochs-sized, never batch-sized. Records without a
    * schema block (older producers) contribute nothing — callers fall back
    * to their static schema when the result is empty.
    */
  def fieldEpochs(log: DataFrame): Seq[Seq[String]] = {
    val fieldsOnly = StructType(Seq(StructField("fields", ArrayType(StringType))))
    log.select(from_json(col("value").cast("string"), fieldsOnly)
        .getField("fields").as("fields"))
      .filter(col("fields").isNotNull)
      .distinct()
      .collect()
      .map(_.getSeq[String](0).toSeq)
      .toSeq
  }

  /** The CURRENT row schema of a batch: the field list declared by its
    * HIGHEST-OFFSET schema-bearing record — the schema at the head of the
    * log, which is what distinguishes a DDL COLUMN DROP (the head epoch no
    * longer lists the column) from a late-replayed old-schema record (an
    * older event missing the column while the head still lists it). One
    * TakeOrdered(1) over the batch; None when no record carries a block.
    */
  def currentFields(log: DataFrame): Option[Seq[String]] = {
    val fieldsOnly = StructType(Seq(StructField("fields", ArrayType(StringType))))
    log.select(col("offset"),
        from_json(col("value").cast("string"), fieldsOnly)
          .getField("fields").as("fields"))
      .filter(col("fields").isNotNull)
      .orderBy(col("offset").desc)
      .limit(1)
      .collect()
      .headOption
      .map(_.getSeq[String](1).toSeq)
  }
}
