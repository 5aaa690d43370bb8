package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` procedures for TxLog table MAINTENANCE — the statements
  * production lakehouse formats put behind `CALL cat.system.…`
  * (Iceberg's procedure surface; Delta spells them OPTIMIZE/VACUUM).
  * Registered by [[TxLogCatalog]] (a `ProcedureCatalog`) under the
  * `system` namespace, so with the catalog bound as `tx`:
  *
  * {{{
  * CALL tx.system.compact(table => 'ns.t', target_files => 4)
  * CALL tx.system.compact(table => 'ns.t', zorder_by => 'x,y')
  * CALL tx.system.vacuum(table => 'ns.t', retain_versions => 3)
  * CALL tx.system.restore(table => 'ns.t', version => 2)
  * CALL tx.system.history(table => 'ns.t')
  * CALL tx.system.sync(src => 'ns.bronze', dst => 'ns.silver',
  *                     writer_id => 'b2s')
  * }}}
  *
  * Each procedure is a thin SQL adapter over its library twin
  * ([[TxLog.compact]]/[[TxLog.vacuum]]/[[TxLog.restore]]/
  * [[TxLog.history]]/[[TxLog.syncOnce]]) — one shared implementation,
  * one concurrency protocol, exactly like the DML path. Results come
  * back as rows (a metadata-sized `LocalScan`): maintenance output is
  * O(files)/O(versions) driver metadata, never table data.
  *
  * Table arguments take the same spellings as the catalog's
  * identifiers: `'ns.t'` under the warehouse, or an absolute
  * `'/path/to/table'`.
  */
private[sources] object TxLogProcedures {

  def all(resolve: Seq[String] => String): Map[String, UnboundProcedure] =
    Seq(new CompactProc(resolve), new VacuumProc(resolve),
        new RestoreProc(resolve), new HistoryProc(resolve),
        new SyncProc(resolve))
      .map(p => p.name -> (p: UnboundProcedure)).toMap

  /** Shared shape: bind is identity (parameters are declared, Spark
    * coerces the args), `call` runs the library op on the driver and
    * returns one in-memory result scan.
    */
  private[sources] abstract class TxLogProcedure(
      resolve: Seq[String] => String)
      extends UnboundProcedure with BoundProcedure {

    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    protected def spark: SparkSession = SparkSession.active
    protected def outputSchema: StructType
    protected def run(args: InternalRow): Seq[InternalRow]

    /** `'ns.t'` (warehouse-relative) or `'/abs/path'` → table root. */
    protected def pathOf(arg: String): String =
      if (arg.startsWith("/")) arg
      else resolve(arg.split('.').toSeq)

    protected def str(r: InternalRow, i: Int): String = {
      require(!r.isNullAt(i), s"${name()}: argument $i must not be null")
      r.getUTF8String(i).toString
    }

    protected def utf8(s: String): UTF8String = UTF8String.fromString(s)

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(input).toArray
      val schema = outputSchema
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema
        override def description(): String = s"txlog CALL ${name()}"
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  /** `compact(table, target_files=1, cluster_by='', zorder_by='')`:
    * bin-pack the live files (optionally range-clustered on
    * `cluster_by`, or z-ordered on exactly two `zorder_by` dims) in
    * one metadata commit — the OPTIMIZE statement. Returns the new
    * version and the file counts it collapsed.
    */
  private final class CompactProc(resolve: Seq[String] => String)
      extends TxLogProcedure(resolve) {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack (optionally cluster/z-order) a txlog table's live files"

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("target_files", IntegerType)
        .defaultValue("1").build(),
      ProcedureParameter.in("cluster_by", StringType)
        .defaultValue("''")
        .comment("comma-separated range-clustering columns").build(),
      ProcedureParameter.in("zorder_by", StringType)
        .defaultValue("''")
        .comment("exactly two comma-separated z-order dimensions").build())

    override val outputSchema: StructType = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))

    override def run(args: InternalRow): Seq[InternalRow] = {
      val path = pathOf(str(args, 0))
      val target = args.getInt(1)
      val cluster = str(args, 2).split(',').map(_.trim).filter(_.nonEmpty)
      val zorder = str(args, 3).split(',').map(_.trim).filter(_.nonEmpty)
      val before = TxLog.snapshot(path).files.size
      val v = zorder match {
        case Array() => TxLog.compact(spark, path, target, cluster.toSeq)
        case Array(a, b) =>
          require(cluster.isEmpty,
            "compact takes cluster_by OR zorder_by, not both")
          TxLog.compactZOrder(spark, path, target, a, b)
        case other => throw new IllegalArgumentException(
          s"zorder_by takes exactly two dimensions, got ${other.length}")
      }
      val after = TxLog.snapshot(path).files.size
      Seq(InternalRow(v, before, after))
    }
  }

  /** `vacuum(table, retain_versions=0, respect_readers=true)`: delete
    * data files no version in the retention window references; one
    * row per deleted file. With `respect_readers` (the default) the
    * call REFUSES while any registered reader's consumed-through
    * version lags the keep-window (the retention handshake —
    * `respect_readers => false` overrides for decommissioned readers).
    */
  private final class VacuumProc(resolve: Seq[String] => String)
      extends TxLogProcedure(resolve) {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete txlog data files unreferenced by the retained versions"

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("retain_versions", IntegerType)
        .defaultValue("0").build(),
      ProcedureParameter.in("respect_readers", BooleanType)
        .defaultValue("true")
        .comment("refuse while a registered reader's HWM lags the " +
          "keep-window").build())

    override val outputSchema: StructType = StructType(Seq(
      StructField("deleted_file", StringType, nullable = false)))

    override def run(args: InternalRow): Seq[InternalRow] =
      TxLog.vacuum(pathOf(str(args, 0)), args.getInt(1),
          respectReaders = args.getBoolean(2))
        .map(f => InternalRow(utf8(f)))
  }

  /** `restore(table, version)`: roll the table back as one new commit
    * (history stays time-travelable). Returns the new version.
    */
  private final class RestoreProc(resolve: Seq[String] => String)
      extends TxLogProcedure(resolve) {
    override def name(): String = "restore"
    override def description(): String =
      "roll a txlog table back to an earlier version as a new commit"

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("version", LongType).build())

    override val outputSchema: StructType = StructType(Seq(
      StructField("restored_to", LongType, nullable = false),
      StructField("new_version", LongType, nullable = false)))

    override def run(args: InternalRow): Seq[InternalRow] = {
      val target = args.getLong(1)
      val v = TxLog.restore(spark, pathOf(str(args, 0)), target)
      Seq(InternalRow(target, v))
    }
  }

  /** `history(table)`: DESCRIBE HISTORY — one row per commit, newest
    * first, with the commit wall-time.
    */
  private final class HistoryProc(resolve: Seq[String] => String)
      extends TxLogProcedure(resolve) {
    override def name(): String = "history"
    override def description(): String =
      "txlog commit history, newest first"

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType).build())

    override val outputSchema: StructType = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("read_version", LongType, nullable = false),
      StructField("files_added", IntegerType, nullable = false),
      StructField("files_removed", IntegerType, nullable = false),
      StructField("commit_time", TimestampType, nullable = false)))

    override def run(args: InternalRow): Seq[InternalRow] = {
      val path = pathOf(str(args, 0))
      TxLog.history(path).map { c =>
        InternalRow(c.version, utf8(c.op), c.readVersion, c.adds,
          c.removes, TxLog.commitTimeMicros(path, c.version))
      }
    }
  }

  /** `sync(src, dst, writer_id)`: one exactly-once incremental
    * micro-batch from `src` to `dst` ([[TxLog.syncOnce]] — the
    * bronze→silver CALL). Returns the number of src versions consumed
    * (0 = caught up).
    */
  private final class SyncProc(resolve: Seq[String] => String)
      extends TxLogProcedure(resolve) {
    override def name(): String = "sync"
    override def description(): String =
      "exactly-once incremental sync between two txlog tables"

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("src", StringType).build(),
      ProcedureParameter.in("dst", StringType).build(),
      ProcedureParameter.in("writer_id", StringType).build())

    override val outputSchema: StructType = StructType(Seq(
      StructField("versions_consumed", LongType, nullable = false)))

    override def run(args: InternalRow): Seq[InternalRow] =
      Seq(InternalRow(TxLog.syncOnce(spark, pathOf(str(args, 0)),
        pathOf(str(args, 1)), str(args, 2))))
  }
}
