package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over the Iceberg-lite table's snapshot
  * manifests: `spark.read.format("graft.sources.LineageSource")
  * .option("path", root).load()` yields one row per (snapshot, bucket)
  * lineage entry — the table-history/audit face of the layout as a
  * first-class Spark source rather than a driver-side helper.
  *
  * Real V2 integration, not a wrapper: COLUMN PRUNING via
  * SupportsPushDownRequiredColumns (the reader materializes only the
  * projected fields) and PREDICATE PUSHDOWN via SupportsPushDownFilters
  * — snapshot comparisons prune whole manifest FILES before any read
  * (one InputPartition per surviving manifest, so `snapshot = k` plans
  * exactly one partition; the same shape an Iceberg metadata table
  * scan has). Snapshot predicates are reported as fully handled
  * (file = one snapshot, so file-level pruning is exact); everything
  * else is left for Spark to evaluate post-scan.
  *
  * Manifests are tiny JSON files written by TableIO.publishSnapshot —
  * the reader reuses TableIO's own parser on the executor (paths must
  * be visible there: local FS under local[*], a shared/remote FS on a
  * cluster, exactly like every file-based source). */
class LineageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val root = properties.get("path")
    require(root != null && root.nonEmpty,
      "graft-lineage source needs .option(\"path\", <table root>)")
    new LineageTable(root)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object LineageSource {
  val schema: StructType = StructType(Seq(
    StructField("snapshot", IntegerType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("minKey", StringType, nullable = false),
    StructField("maxKey", StringType, nullable = false),
    StructField("errorRows", LongType, nullable = false),
    StructField("wallMs", LongType, nullable = false),
    StructField("version", IntegerType, nullable = false)))
}

final class LineageTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_lineage($root)"
  override def schema(): StructType = LineageSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LineageScanBuilder(root)
}

final class LineageScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = LineageSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (snapFilters, rest) = filters.partition {
      case EqualTo("snapshot", _: Int)            => true
      case GreaterThan("snapshot", _: Int)        => true
      case GreaterThanOrEqual("snapshot", _: Int) => true
      case LessThan("snapshot", _: Int)           => true
      case LessThanOrEqual("snapshot", _: Int)    => true
      case _                                      => false
    }
    pushed = snapFilters
    rest // snapshot pruning is exact at file granularity: fully handled
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new LineageScan(root, pushed, required)
}

final class LineageScan(root: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def snapSurvives(snap: Int): Boolean = pushed.forall {
    case EqualTo("snapshot", v: Int)            => snap == v
    case GreaterThan("snapshot", v: Int)        => snap > v
    case GreaterThanOrEqual("snapshot", v: Int) => snap >= v
    case LessThan("snapshot", v: Int)           => snap < v
    case LessThanOrEqual("snapshot", v: Int)    => snap <= v
    case _                                      => true
  }

  override def planInputPartitions(): Array[InputPartition] =
    graft.io.TableIO.snapshotIds(root)
      .filter(snapSurvives)
      .map(id => LineagePartition(
        s"$root/_snapshots/snap-$id.json", id): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LineageReaderFactory(required)
}

final case class LineagePartition(path: String, snapshot: Int)
    extends InputPartition

final class LineageReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LineagePartition]
    new LineageReader(p, required)
  }
}

final class LineageReader(p: LineagePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val entries = graft.io.TableIO
    .parseManifestFile(java.nio.file.Paths.get(p.path), p.snapshot)
    .iterator
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!entries.hasNext) false
    else {
      val l = entries.next()
      // project to exactly the pruned columns, in their pruned order
      current = InternalRow.fromSeq(required.fields.map(_.name).toSeq.map {
        case "snapshot"  => l.snapshotId
        case "bucket"    => l.bucket
        case "rows"      => l.rows
        case "minKey"    => UTF8String.fromString(l.minKey)
        case "maxKey"    => UTF8String.fromString(l.maxKey)
        case "errorRows" => l.errorRows
        case "wallMs"    => l.wallMs
        case "version"   => l.version
      })
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
