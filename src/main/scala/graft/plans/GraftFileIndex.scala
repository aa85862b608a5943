package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-integrated snapshot file index — the warehouse's answer to
  * Delta's `TahoeFileIndex`: a [[FileIndex]] whose `listFiles` resolves the
  * COMMITTED manifest file set and prunes it with BOTH the partition
  * filters Catalyst extracts (evaluated against the `col=value` directory
  * values, exactly Spark's own partition-pruning contract) and the data
  * filters it pushes down (time-column bounds and stream-id equality/IN
  * sets, checked against the manifest's per-file min/max + bloom stats via
  * the caller's `keep` callback).
  *
  * This moves manifest data-skipping INSIDE the planner: an ad-hoc
  * `.where(ts between …)` or `.where(stream_id = …)` over the snapshot
  * relation prunes files with no facade hint — previously only reads that
  * went through `getData`-style entry points (which pre-extract bounds)
  * got file-level skipping. Facade hints still apply: the constructor's
  * file list is already hint-pruned, so Catalyst pruning only ever
  * SHRINKS it further, and the exact row-level predicates still run —
  * stats pruning is a superset filter, never a correctness dependency.
  *
  * Extraction is deliberately conservative: bounds are read only from
  * AND-composed comparison shapes against literals (`>`, `>=`, `<`, `<=`,
  * `=`, `In`, `InSet`); anything else (an `Or`, a cast, an expression
  * operand) contributes nothing and the file survives — pruning stays
  * sound under every filter Catalyst can push.
  *
  * At 100 TB: `listFiles` is a driver-side walk of the manifest file list
  * (metadata-scale, no FS listing — statuses arrive from the snapshot
  * resolution the read already performed), and the returned
  * `PartitionDirectory`s feed Spark's ordinary split planning. A cluster
  * deployment would additionally record file LENGTHS in the manifest
  * stats line (as Delta/Iceberg do) so even the status fetch disappears;
  * the format extension is mechanical.
  */
final class GraftFileIndex(
    tableRoot: String,
    // (relative path, status) for every hint-surviving snapshot file
    files: Seq[(String, FileStatus)],
    override val partitionSchema: StructType,
    // the data column the manifest ts stats describe ("ts"/"bucket_start")
    tsCol: String,
    // (rel, µs range, sorted sid set) => survives manifest-stats skipping
    keep: (String, Option[(Long, Long)], Option[IndexedSeq[String]]) => Boolean)
    extends FileIndex {

  /** Relative paths of the last `listFiles` plan (test seam: pins that
    * Catalyst-pushed filters actually shrank the file set).
    */
  @volatile var lastPlanned: Seq[String] = Nil

  override def rootPaths: Seq[Path] = Seq(new Path(tableRoot))

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = files.map(_._2.getLen).sum

  override def inputFiles: Array[String] =
    files.map { case (rel, _) => s"$tableRoot/$rel" }.toArray

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val range = tsBounds(dataFilters)
    val sids = sidSet(dataFilters).map(_.toIndexedSeq.sorted)
    val statsKept =
      if (range.isEmpty && sids.isEmpty) files
      else files.filter { case (rel, _) => keep(rel, range, sids) }
    val partKept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) statsKept
      else {
        val bound = partitionFilters.map(_.transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }).reduce(And)
        val pred = Predicate.create(bound)
        pred.initialize(0)
        statsKept.filter { case (rel, _) => pred.eval(partitionValues(rel)) }
      }
    lastPlanned = partKept.map(_._1)
    partKept.groupBy { case (rel, _) => partitionValues(rel) }
      .toSeq
      .map { case (values, fs) =>
        PartitionDirectory(values, fs.map(_._2).toArray)
      }
  }

  /** Parse this file's `col=value` directory values into an InternalRow in
    * partition-schema order — the same un-escaping Spark's own partition
    * discovery applies (the warehouse writes through `partitionBy`, so the
    * escaping scheme IS Spark's).
    */
  private def partitionValues(rel: String): InternalRow = {
    val segs = rel.split('/')
    val vals = partitionSchema.fields.map { f =>
      segs.collectFirst {
        case s if s.startsWith(f.name + "=") =>
          val raw = ExternalCatalogUtils.unescapePathName(
            s.substring(f.name.length + 1))
          if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) null
          else f.dataType match {
            case DateType =>
              java.time.LocalDate.parse(raw).toEpochDay.toInt
            case StringType => UTF8String.fromString(raw)
            case LongType => raw.toLong
            case IntegerType => raw.toInt
            case dt => throw new IllegalStateException(
              s"unsupported partition column type $dt for ${f.name}")
          }
      }.orNull
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  /** Inclusive µs bounds implied by AND-composed pushed comparisons on
    * `tsCol`. Strict bounds widen to inclusive (a superset — sound for
    * skipping; the exact predicate still runs row-level).
    */
  private def tsBounds(filters: Seq[Expression]): Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var anyBound = false
    def tsLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case _ => None
    }
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == tsCol
      case _ => false
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, v) if isTs(a) =>
        tsLit(v).foreach { x => lo = math.max(lo, x); anyBound = true }
      case GreaterThan(a, v) if isTs(a) =>
        tsLit(v).foreach { x => lo = math.max(lo, x); anyBound = true }
      case LessThanOrEqual(a, v) if isTs(a) =>
        tsLit(v).foreach { x => hi = math.min(hi, x); anyBound = true }
      case LessThan(a, v) if isTs(a) =>
        tsLit(v).foreach { x => hi = math.min(hi, x); anyBound = true }
      case EqualTo(a, v) if isTs(a) =>
        tsLit(v).foreach { x =>
          lo = math.max(lo, x); hi = math.min(hi, x); anyBound = true
        }
      // reversed operand order: literal op column
      case GreaterThanOrEqual(v, a) if isTs(a) =>
        tsLit(v).foreach { x => hi = math.min(hi, x); anyBound = true }
      case GreaterThan(v, a) if isTs(a) =>
        tsLit(v).foreach { x => hi = math.min(hi, x); anyBound = true }
      case LessThanOrEqual(v, a) if isTs(a) =>
        tsLit(v).foreach { x => lo = math.max(lo, x); anyBound = true }
      case LessThan(v, a) if isTs(a) =>
        tsLit(v).foreach { x => lo = math.max(lo, x); anyBound = true }
      case EqualTo(v, a) if isTs(a) =>
        tsLit(v).foreach { x =>
          lo = math.max(lo, x); hi = math.min(hi, x); anyBound = true
        }
      case _ => ()
    }
    filters.foreach(walk)
    if (anyBound) Some((lo, hi)) else None
  }

  /** Stream-id set implied by AND-composed pushed `=` / `In` / `InSet` on
    * `stream_id`; multiple constraints intersect. None = unconstrained.
    */
  private def sidSet(filters: Seq[Expression]): Option[Set[String]] = {
    var acc: Option[Set[String]] = None
    def add(s: Set[String]): Unit =
      acc = Some(acc.fold(s)(_ intersect s))
    def isSid(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "stream_id"
      case _ => false
    }
    def str(e: Expression): Option[String] = e match {
      case Literal(u: UTF8String, StringType) => Some(u.toString)
      case _ => None
    }
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, v) if isSid(a) => str(v).foreach(s => add(Set(s)))
      case EqualTo(v, a) if isSid(a) => str(v).foreach(s => add(Set(s)))
      case In(a, vs) if isSid(a) =>
        val ss = vs.map(str)
        if (ss.nonEmpty && ss.forall(_.isDefined)) add(ss.flatten.toSet)
      case InSet(a, vs) if isSid(a) =>
        val ss = vs.collect { case u: UTF8String => u.toString }
        if (ss.size == vs.size) add(ss)
      case _ => ()
    }
    filters.foreach(walk)
    acc
  }
}
