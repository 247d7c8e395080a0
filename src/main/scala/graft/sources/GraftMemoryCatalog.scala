package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => swrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** An in-memory DataSource-V2 `TableCatalog` — the Spark-native analog of
  * the reference's catalog registration + `USE CATALOG`
  * (SecurityContext.java:116-121: `useCatalog(AbstractCatalog)` registers a
  * Flink catalog and makes it current). Registering this class as e.g.
  * `spark.sql.catalog.hive` makes `hive.default.orders` a real resolvable
  * 3-part identifier: scans arrive as `DataSourceV2Relation` under a
  * `SubqueryAlias` carrying the full catalog path (which the security rules
  * already match), and `INSERT INTO` analyzes to a genuine `AppendData`
  * write.
  *
  * LOCAL/TEST connector, like Spark's own test `InMemoryTableCatalog`: rows
  * live in a process-wide store keyed by (catalog, identifier), so it is
  * correct in `local[*]` (one JVM) and for driver-side golden fixtures —
  * NOT a distributed storage backend. The 100 TB path is parquet/bucketed
  * tables ([[Sources]]); this exists for catalog-resolution fidelity and
  * sink contract tests.
  */
class GraftMemoryCatalog extends TableCatalog with SupportsNamespaces {
  import GraftMemoryCatalog._

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): (String, String) =
    (catalogName, ident.namespace().mkString(".") + "." + ident.name())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = namespace.mkString(".") + "."
    tables.keys.collect {
      case (c, full) if c == catalogName && full.startsWith(prefix) =>
        Identifier.of(namespace, full.stripPrefix(prefix))
    }.toArray
  }

  override def loadTable(ident: Identifier): Table =
    tables.getOrElse(key(ident),
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "GraftMemoryCatalog does not support partitioning")
    val t = new MemTable(ident.toString, schema, key(ident))
    if (tables.putIfAbsent(key(ident), t).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.toString)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    rows.remove(key(ident))
    tables.remove(key(ident)).isDefined
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE not supported")

  // --- namespaces: a flat, implicit set — any namespace a table lives in,
  // plus "default" so `USE <catalog>.default` works before the first DDL ---
  private def namespaces: Set[Seq[String]] =
    tables.keys.collect { case (c, full) if c == catalogName =>
      full.split("\\.").dropRight(1).toSeq
    }.toSet + Seq("default")

  override def listNamespaces(): Array[Array[String]] =
    namespaces.map(_.toArray).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespaces.contains(namespace.toSeq)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

object GraftMemoryCatalog {
  /** (catalog, db.table) -> table definition / rows. Process-wide so the
    * executor-side writers and readers of local mode share it.
    */
  private val tables =
    scala.collection.concurrent.TrieMap.empty[(String, String), MemTable]
  private val rows =
    scala.collection.concurrent.TrieMap.empty[(String, String), Vector[Seq[Any]]]

  /** Rows currently in a table (external Scala values), test/assertion API. */
  def rowsOf(catalog: String, dbTable: String): Vector[Seq[Any]] =
    rows.getOrElse((catalog, dbTable), Vector.empty)
  def clear(): Unit = { tables.clear(); rows.clear() }

  private class MemTable(ident: String, tableSchema: StructType,
      storeKey: (String, String)) extends Table with SupportsRead with SupportsWrite
      with SupportsRowLevelOperations {
    override def name(): String = ident
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan with Batch {
          override def readSchema(): StructType = tableSchema
          override def toBatch: Batch = this
          override def planInputPartitions(): Array[InputPartition] =
            Array(MemPartition(rows.getOrElse(storeKey, Vector.empty)))
          override def createReaderFactory(): PartitionReaderFactory =
            new MemReaderFactory(tableSchema)
        }
      }

    /** Row-level DML (MERGE INTO / UPDATE / DELETE): GROUP-BASED
      * (copy-on-write), the Iceberg copy-on-write model Spark's
      * RewriteMergeIntoTable / RewriteUpdateTable / RewriteDeleteFromTable
      * plan as `ReplaceData` — Catalyst reads the affected groups through
      * the operation's scan, computes the surviving/updated/inserted rows,
      * and the operation's write REPLACES exactly what the scan covered.
      * This table exposes no partition/file metadata columns, so the one
      * group is the WHOLE table: the scan is the ordinary full scan and the
      * commit is truncate-and-write. (At 100 TB the same contract holds
      * per-file/per-partition for real formats — group granularity is the
      * table's choice, invisible to the rewritten plan's semantics.) The
      * reference has no DML rewrite surface beyond INSERT bodies
      * (RewriteRowFilterTest.java:484-541); this is the beyond-reference
      * write path [[graft.SecurityContext.executeDml]] secures.
      */
    override def newRowLevelOperationBuilder(
        info: RowLevelOperationInfo): RowLevelOperationBuilder =
      () => new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          MemTable.this.newScanBuilder(options)
        override def newWriteBuilder(wi: LogicalWriteInfo): WriteBuilder =
          new WriteBuilder {
            override def build(): Write = new Write {
              override def toBatch: BatchWrite = new BatchWrite {
                override def createBatchWriterFactory(
                    pi: PhysicalWriteInfo): DataWriterFactory =
                  new RowLevelWriterFactory(wi.schema())
                override def commit(messages: Array[WriterCommitMessage]): Unit = {
                  val batch = messages.collect { case MemCommit(rs) => rs }
                    .flatten.toVector
                  // replace the read group = the whole table
                  rows.update(storeKey, batch)
                }
                override def abort(messages: Array[WriterCommitMessage]): Unit = ()
              }
            }
          }
      }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        // Truncate is a property of the WRITE, not a one-shot flag: batch
        // INSERT OVERWRITE replaces once, and a Complete-mode stream must
        // replace on EVERY epoch (each epoch carries the full result set) —
        // consuming the flag on the first commit would leave later epochs
        // appending stale rows.
        private var truncateMode = false
        override def truncate(): WriteBuilder = { truncateMode = true; this }
        private def applyCommit(messages: Array[WriterCommitMessage]): Unit = {
          val batch = messages.collect { case MemCommit(rs) => rs }
            .flatten.toVector
          if (truncateMode) rows.update(storeKey, batch)
          else rows.updateWith(storeKey) {
            case Some(existing) => Some(existing ++ batch)
            case None => Some(batch)
          }
          ()
        }
        override def build(): Write = new Write {
          override def toBatch: BatchWrite = new BatchWrite {
            override def createBatchWriterFactory(
                info: PhysicalWriteInfo): DataWriterFactory =
              new MemWriterFactory(info.hashCode(), tableSchema, storeKey)
            override def commit(messages: Array[WriterCommitMessage]): Unit =
              applyCommit(messages)
            override def abort(messages: Array[WriterCommitMessage]): Unit = ()
          }
          // streaming append — the memory-catalog analog of the reference's
          // `print` sink (its executes are streaming INSERTs into it,
          // AbstractBasicTest.java:239-253): each micro-batch's rows commit
          // into the shared store. At-least-once like any non-idempotent
          // sink: a replayed epoch re-appends (same caveat as the parquet
          // ingest sinks, documented there).
          override def toStreaming: swrite.StreamingWrite =
            new swrite.StreamingWrite {
              override def createStreamingWriterFactory(
                  info: PhysicalWriteInfo): swrite.StreamingDataWriterFactory =
                new MemStreamingWriterFactory(tableSchema, storeKey)
              override def commit(epochId: Long,
                  messages: Array[WriterCommitMessage]): Unit =
                applyCommit(messages)
              override def abort(epochId: Long,
                  messages: Array[WriterCommitMessage]): Unit = ()
            }
        }
      }
  }

  private case class MemPartition(data: Vector[Seq[Any]]) extends InputPartition

  private class MemReaderFactory(schema: StructType)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val data = partition.asInstanceOf[MemPartition].data
      val toCatalyst = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(schema)
      val it = data.iterator
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!it.hasNext) return false
          current = toCatalyst(org.apache.spark.sql.Row.fromSeq(it.next()))
            .asInstanceOf[InternalRow]
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }

  private case class MemCommit(rs: Seq[Seq[Any]]) extends WriterCommitMessage

  private def newMemWriter(schema: StructType): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Seq[Any]]
      // convert FIELD BY FIELD through the row accessors, never via
      // record.copy(): the row-level-DML exec hands the writer a
      // ProjectingInternalRow whose copy() returns the UNDERLYING full row
      // (operation column included), silently breaking the projection
      private val fieldConverters = schema.fields.map(f =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(f.dataType))
      override def write(record: InternalRow): Unit = {
        buf += Seq.tabulate(schema.length) { i =>
          if (record.isNullAt(i)) null
          else fieldConverters(i)(record.get(i, schema(i).dataType))
        }
        ()
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }

  private class MemWriterFactory(id: Int, schema: StructType,
      storeKey: (String, String)) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      newMemWriter(schema)
  }

  /** Writer for the row-level-DML replace path. Catalyst's group-based
    * rewrite prepends an `__row_operation` metadata column to the write
    * plan's output, and for a table with no `requiredMetadataAttributes`
    * the physical writer hands rows through UNPROJECTED (the
    * row-projection branch only engages together with a metadata
    * projection — WriteToDataSourceV2Exec's `writingTask`). The declared
    * write schema (`LogicalWriteInfo.schema`) carries only the data
    * columns, so the data fields sit at a fixed leading offset:
    * `numFields - schema.length`. Reading at that offset handles both the
    * unprojected shape and an already-projected row (offset 0) with one
    * rule.
    */
  private class RowLevelWriterFactory(schema: StructType)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val buf = Vector.newBuilder[Seq[Any]]
        private val fieldConverters = schema.fields.map(f =>
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToScalaConverter(f.dataType))
        override def write(record: InternalRow): Unit = {
          val off = record.numFields - schema.length
          require(off >= 0, s"row-level write row has ${record.numFields} " +
            s"fields for a ${schema.length}-column write schema")
          buf += Seq.tabulate(schema.length) { i =>
            if (record.isNullAt(off + i)) null
            else fieldConverters(i)(record.get(off + i, schema(i).dataType))
          }
          ()
        }
        override def commit(): WriterCommitMessage = MemCommit(buf.result())
        override def abort(): Unit = ()
        override def close(): Unit = ()
      }
  }

  private class MemStreamingWriterFactory(schema: StructType,
      storeKey: (String, String)) extends swrite.StreamingDataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long,
        epochId: Long): DataWriter[InternalRow] = newMemWriter(schema)
  }
}
