package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.{AnyColumn, GenericTable, GraftTable}

/** DataSource V2 scan for GENERIC (any-schema) graft tables — the SQL
  * pushdown parity the Scala `GenericTable.decode` API already has:
  *
  *   - column pruning: only the codec payloads (`pl_<i>`) of the leaves
  *     backing the REQUESTED top-level fields are read from parquet;
  *   - key-range pushdown: comparisons on the table's integral range-key
  *     column compose into one [lo, hi] interval pushed as a parquet
  *     row-group + record filter on the per-block `key_min`/`key_max`
  *     zone-map columns — no driver-side id set at ANY table size (the
  *     interval, not the surviving ids, travels to the executors) — plus
  *     whole-VERSION pruning from the manifest key spans;
  *   - schema evolution: each partition decodes under the write schema of
  *     its version and null-fills fields that postdate it, exactly like
  *     [[GenericTable.decodeFields]];
  *   - metadata COUNT(*) and snapshot statistics, as in the token scan.
  *
  * Every accepted filter stays residual, so pruning is never the
  * correctness mechanism.
  */
class GraftGenericScanBuilder(tableDir: String, snap: GraftTable.Snapshot)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private val fullSchema = GenericTable.readSchemaOf(snap)
  private val keyName = GenericTable.keyNameOf(snap)
  private val keyIsIntegral = fullSchema.fields.find(_.name == keyName)
    .exists(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var limit = -1

  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushed.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar])

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) false
    else { countPushed = true; true }
  }

  private def asLong(v: Any): Option[Long] = v match {
    case n: Long => Some(n)
    case n: Int => Some(n.toLong)
    case n: Short => Some(n.toLong)
    case n: Byte => Some(n.toLong)
    case _ => None
  }

  /** Key comparisons are accepted only when the key column is integral —
    * there the engine's range key IS the value (`keyExprOf` casts it to
    * long), so [key_min, key_max] zone maps bound it exactly. Everything
    * else is left to the residual plan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (keyIsIntegral)
      pushed = filters.filter {
        case EqualTo(`keyName`, v) => asLong(v).isDefined
        case GreaterThan(`keyName`, v) => asLong(v).isDefined
        case GreaterThanOrEqual(`keyName`, v) => asLong(v).isDefined
        case LessThan(`keyName`, v) => asLong(v).isDefined
        case LessThanOrEqual(`keyName`, v) => asLong(v).isDefined
        case In(`keyName`, vs) => vs.nonEmpty && vs.forall(asLong(_).isDefined)
        case _ => false
      }
    filters // all residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** The conjunction of the pushed key filters as one conservative
    * [lo, hi] interval (In widens to its min..max envelope).
    */
  private[sources] def keyRange: Option[(Long, Long)] = {
    if (pushed.isEmpty) return None
    var lo = Long.MinValue
    var hi = Long.MaxValue
    pushed.foreach {
      case EqualTo(_, v) =>
        val n = asLong(v).get; lo = math.max(lo, n); hi = math.min(hi, n)
      case GreaterThan(_, v) =>
        val n = asLong(v).get; if (n < Long.MaxValue) lo = math.max(lo, n + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, asLong(v).get)
      case LessThan(_, v) =>
        val n = asLong(v).get; if (n > Long.MinValue) hi = math.min(hi, n - 1)
      case LessThanOrEqual(_, v) => hi = math.min(hi, asLong(v).get)
      case In(_, vs) =>
        val ns = vs.map(asLong(_).get)
        lo = math.max(lo, ns.min); hi = math.min(hi, ns.max)
      case _ =>
    }
    Some((lo, hi))
  }

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    val fields = fullSchema.fields.filter(f => keep.contains(f.name))
    // an empty prune (count over a pruned scan) still needs row
    // multiplicity; the reader derives it from the block row_count, so an
    // empty StructType is legal here
    required = StructType(fields)
  }

  override def build(): Scan =
    if (countPushed) new GraftCountScan(tableDir, snap)
    else new GraftGenericScan(tableDir, snap, required, pushed, keyRange, limit)
}

/** One partition = one parquet data file + the write schema of its
  * version + the pushed key interval.
  */
final case class GraftGenericInputPartition(
    file: String,
    writeSchemaJson: String,
    range: Option[(Long, Long)],
    splitStart: Long = 0L,
    splitEnd: Long = Long.MaxValue) extends InputPartition

class GraftGenericScan(
    tableDir: String,
    snap: GraftTable.Snapshot,
    required: StructType,
    pushed: Array[Filter],
    range: Option[(Long, Long)],
    limit: Int = -1) extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.of(snap.bytesTotal)
    override def numRows(): OptionalLong = OptionalLong.of(snap.rowCount)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // whole-version pruning from the manifest key spans (tiny JSON read on
    // the driver — the interval itself, never an id set)
    val liveDirs = range match {
      case Some((lo, hi)) => GenericTable.rangeDataDirs(spark, tableDir, snap, lo, hi)
      case None => snap.dataDirs
    }
    val parts = Seq.newBuilder[InputPartition]
    liveDirs.groupBy(GraftTable.versionOfDir).toSeq.sortBy(_._1).foreach {
      case (ver, dirs) =>
        val vsnap =
          if (ver == snap.version) snap
          else GraftTable.snapshotVersion(spark, tableDir, ver).getOrElse(
            throw new IllegalStateException(s"metadata/v$ver.json missing"))
        val wjson = GenericTable.writeSchemaOf(vsnap).json
        dirs.foreach { d =>
          val dir = new HPath(s"$tableDir/$d")
          val fs = dir.getFileSystem(conf)
          fs.listStatus(dir).foreach { st =>
            val n = st.getPath.getName
            if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
              // sub-file splits: read parallelism bounded by row groups,
              // not files (see GraftScan.splitRanges)
              GraftScan.splitRanges(st.getLen, splitBytes).foreach { case (lo, hi) =>
                parts += GraftGenericInputPartition(
                  st.getPath.toString, wjson, range, lo, hi)
              }
          }
        }
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftGenericReaderFactory(required.json,
      new graft.expr.SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration), limit)

  override def description(): String =
    s"graft-generic columns=[${required.fieldNames.mkString(",")}] " +
      s"range=${range.map(r => s"[${r._1},${r._2}]").getOrElse("all")} " +
      s"pushed=[${pushed.mkString(",")}]"
}

class GraftGenericReaderFactory(
    requiredJson: String,
    conf: graft.expr.SerializableHadoopConf,
    limit: Int = -1) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftGenericPartitionReader(
      partition.asInstanceOf[GraftGenericInputPartition], requiredJson, conf, limit)
}

/** Decodes one generic data file block by block: the needed leaf payloads
  * decode via the shared [[AnyColumn.decodeCatalyst]] and rows assemble
  * straight into Catalyst internal representations — dates/timestamps are
  * identity (days/micros ARE the internal forms), decimals rebuild from
  * the stored unscaled long, structs from their presence + child leaves,
  * maps from their key/value array leaves.
  */
class GraftGenericPartitionReader(
    part: GraftGenericInputPartition,
    requiredJson: String,
    hconf: graft.expr.SerializableHadoopConf,
    limit: Int = -1) extends PartitionReader[InternalRow] {

  private val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
  private val writeSchema = DataType.fromJson(part.writeSchemaJson).asInstanceOf[StructType]
  private val wplan = GenericTable.planOf(writeSchema)
  private val leafIdx: Map[String, Int] =
    wplan.flatMap(_._2).map(_.name).zipWithIndex.toMap
  private val kinds: Map[String, String] =
    wplan.flatMap(_._2).map(l => l.name -> l.kind).toMap
  private val byName = wplan.map(p => p._1.name -> p._1).toMap

  /** Leaves the requested fields need from this write schema. */
  private val neededLeaves: Seq[String] = {
    val fields = required.fields.toIndexedSeq.flatMap(f => byName.get(f.name))
    def leavesOf(f: StructField): Seq[String] =
      wplan.find(_._1.name == f.name).get._2.map(_.name)
    fields.flatMap(leavesOf).distinct
  }

  // decoded leaf arrays of the CURRENT block, in a dense slot array:
  // builders resolve their slot ONCE at construction and read
  // `leafArr(slot)(i)` per row — no per-row hash probes in the hot loop
  private val leafSlot: Map[String, Int] = neededLeaves.zipWithIndex.toMap
  private val leafArr: Array[Array[Any]] = new Array(neededLeaves.length)

  /** Per-row value builder for one requested field — mirrors
    * GenericTable.restore at the InternalRow level. Fully recursive over
    * the same leg naming scheme as [[GenericTable.fieldLeaves]], so
    * arrays nest to any depth (list<list<list<T>>>, list<struct> whose
    * fields are arrays/structs/maps, list<map<K,V>>, ...).
    */
  private def builder(path: String, dt: DataType, nullable: Boolean): Int => Any =
    dt match {
      case IntegerType | LongType | StringType | DoubleType | FloatType |
           BinaryType =>
        val s = leafSlot(path); i => leafArr(s)(i)
      case ByteType =>
        val s = leafSlot(path)
        i => { val v = leafArr(s)(i)
          if (v == null) null else java.lang.Byte.valueOf(v.asInstanceOf[Int].toByte) }
      case ShortType =>
        val s = leafSlot(path)
        i => { val v = leafArr(s)(i)
          if (v == null) null else java.lang.Short.valueOf(v.asInstanceOf[Int].toShort) }
      case BooleanType =>
        val s = leafSlot(path)
        i => { val v = leafArr(s)(i)
          if (v == null) null else java.lang.Boolean.valueOf(v.asInstanceOf[Int] != 0) }
      case DateType => // stored unix_date int == internal days
        val s = leafSlot(path); i => leafArr(s)(i)
      case TimestampType | TimestampNTZType => // stored micros == internal micros
        val s = leafSlot(path); i => leafArr(s)(i)
      case d: DecimalType if d.precision <= 18 =>
        val s = leafSlot(path)
        i => { val v = leafArr(s)(i)
          if (v == null) null
          else Decimal.createUnsafe(v.asInstanceOf[Long], d.precision, d.scale) }
      case d: DecimalType => // wide: string leaf
        val s = leafSlot(path)
        i => { val v = leafArr(s)(i)
          if (v == null) null
          else Decimal(BigDecimal(v.toString), d.precision, d.scale) }
      case at: ArrayType => arrayBuilder(path, at)
      case st: StructType =>
        val children = st.fields.map(f =>
          builder(s"$path.${f.name}", f.dataType, nullable = true))
        val presSlot = if (nullable) leafSlot(s"$path.__p") else -1
        i => {
          val here = presSlot < 0 || {
            val p = leafArr(presSlot)(i)
            p != null && p.asInstanceOf[Int] == 1
          }
          if (!here) null
          else {
            val vals = new Array[Any](children.length)
            var c = 0
            while (c < children.length) { vals(c) = children(c)(i); c += 1 }
            new GenericInternalRow(vals)
          }
        }
      case MapType(kt, vt, vcn) =>
        val keys = builder(s"$path.__mk", ArrayType(kt, containsNull = false), nullable)
        val values = builder(s"$path.__mv", ArrayType(vt, containsNull = vcn), nullable)
        i => {
          val k = keys(i)
          if (k == null) null
          else new ArrayBasedMapData(k.asInstanceOf[ArrayData],
            values(i).asInstanceOf[ArrayData])
        }
      case other => throw new UnsupportedOperationException(other.catalogString)
    }

  /** Builder for one array-shaped leg: returns per-row ArrayData (or null)
    * whose elements are already in Catalyst internal form for the declared
    * element type. Recurses exactly like the encode-side shredding.
    */
  private def arrayBuilder(path: String, at: ArrayType): Int => Any = at.elementType match {
    case ByteType | ShortType | BooleanType =>
      // stored as int arrays; elements convert back
      val elem = at.elementType
      val s = leafSlot(path)
      i => { val v = leafArr(s)(i)
        if (v == null) null
        else {
          val a = v.asInstanceOf[ArrayData]
          val out = new Array[Any](a.numElements())
          var j = 0
          while (j < out.length) {
            if (!a.isNullAt(j)) out(j) = elem match {
              case ByteType => java.lang.Byte.valueOf(a.getInt(j).toByte)
              case ShortType => java.lang.Short.valueOf(a.getInt(j).toShort)
              case _ => java.lang.Boolean.valueOf(a.getInt(j) != 0)
            }
            j += 1
          }
          new GenericArrayData(out)
        }
      }
    case d: DecimalType =>
      // stored as unscaled-long (<=18) / exact-string (wide) legs
      val s = leafSlot(path)
      i => { val v = leafArr(s)(i)
        if (v == null) null
        else {
          val a = v.asInstanceOf[ArrayData]
          val out = new Array[Any](a.numElements())
          var j = 0
          while (j < out.length) {
            if (!a.isNullAt(j)) out(j) =
              if (d.precision <= 18) Decimal.createUnsafe(a.getLong(j), d.precision, d.scale)
              else Decimal(BigDecimal(a.getUTF8String(j).toString), d.precision, d.scale)
            j += 1
          }
          new GenericArrayData(out)
        }
      }
    case inner: ArrayType =>
      // (inner lengths, recursively-rebuilt flat elements) legs — see
      // GenericTable's nested-repetition shredding; a null length
      // restores a null inner array, and the flat leg is itself a full
      // array builder over the (possibly nested) inner element type
      val lensSlot = leafSlot(s"$path.__ll")
      val flatB = arrayBuilder(s"$path.__lv",
        ArrayType(inner.elementType, containsNull = true))
      val elemT = inner.elementType
      i => {
        val lv = leafArr(lensSlot)(i)
        if (lv == null) null
        else {
          val lens = lv.asInstanceOf[ArrayData]
          val flat = flatB(i).asInstanceOf[ArrayData]
          val out = new Array[Any](lens.numElements())
          var off = 0
          var j = 0
          while (j < out.length) {
            if (!lens.isNullAt(j)) {
              val n = lens.getInt(j)
              val elems = new Array[Any](n)
              var k = 0
              while (k < n) {
                if (!flat.isNullAt(off + k)) elems(k) = flat.get(off + k, elemT)
                k += 1
              }
              out(j) = new GenericArrayData(elems)
              off += n
            }
            j += 1
          }
          new GenericArrayData(out)
        }
      }
    case st: StructType =>
      // parallel per-field legs share element positions (see
      // GenericTable's list<struct> shredding); each leg is recursively
      // rebuilt, so fields may be arrays/structs/maps themselves
      val cn = at.containsNull
      val legB = st.fields.map(f =>
        arrayBuilder(s"$path.__af.${f.name}", ArrayType(f.dataType, containsNull = true)))
      val ftypes = st.fields.map(_.dataType)
      val presSlot = if (cn) leafSlot(s"$path.__ap") else -1
      i => {
        val legs = new Array[ArrayData](legB.length)
        var c = 0
        while (c < legs.length) { legs(c) = legB(c)(i).asInstanceOf[ArrayData]; c += 1 }
        if (legs(0) == null) null
        else {
          val pres =
            if (presSlot >= 0) leafArr(presSlot)(i).asInstanceOf[ArrayData] else null
          val n = legs(0).numElements()
          val out = new Array[Any](n)
          var j = 0
          while (j < n) {
            if (pres == null || pres.getInt(j) == 1) {
              val vals = new Array[Any](legs.length)
              c = 0
              while (c < legs.length) {
                if (!legs(c).isNullAt(j)) vals(c) = legs(c).get(j, ftypes(c))
                c += 1
              }
              out(j) = new GenericInternalRow(vals)
            }
            j += 1
          }
          new GenericArrayData(out)
        }
      }
    case mt: MapType =>
      // per-element keys/values ride two array-of-array legs; zip them
      // back (a null keys-element ⇔ a null map element)
      val keysB = arrayBuilder(s"$path.__amk",
        ArrayType(ArrayType(mt.keyType, containsNull = false), containsNull = true))
      val valsB = arrayBuilder(s"$path.__amv",
        ArrayType(ArrayType(mt.valueType, mt.valueContainsNull), containsNull = true))
      i => {
        val k = keysB(i)
        if (k == null) null
        else {
          val ka = k.asInstanceOf[ArrayData]
          val va = valsB(i).asInstanceOf[ArrayData]
          val out = new Array[Any](ka.numElements())
          var j = 0
          while (j < out.length) {
            if (!ka.isNullAt(j))
              out(j) = new ArrayBasedMapData(ka.getArray(j), va.getArray(j))
            j += 1
          }
          new GenericArrayData(out)
        }
      }
    // int/long/string/float/double/date/timestamp arrays: stored forms
    // ARE the internal forms — the leaf ArrayData passes through
    case _ =>
      val s = leafSlot(path); i => leafArr(s)(i)
  }

  /** One builder per REQUIRED field; fields this version predates emit
    * null (schema evolution).
    */
  private val fieldBuilders: Array[Int => Any] =
    required.fields.map { f =>
      byName.get(f.name) match {
        case Some(wf) => builder(wf.name, wf.dataType, wf.nullable)
        case None => (_: Int) => null
      }
    }

  private val reader = {
    val conf = new Configuration(hconf.value)
    val path = new HPath(part.file)
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val fileSchema = try footer.getFooter.getFileMetaData.getSchema finally footer.close()
    // row_count drives multiplicity (no payload needed for SELECT count
    // shapes); key_min/key_max ride along for the record-level filter
    val names = Seq("row_count", "key_min", "key_max") ++
      neededLeaves.map(n => s"pl_${leafIdx(n)}")
    val proj = new MessageType(fileSchema.getName,
      names.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    var b = ParquetReader.builder(new GroupReadSupport(), path).withConf(conf)
    if (part.splitStart > 0L || part.splitEnd != Long.MaxValue)
      b = b.withFileRange(part.splitStart, part.splitEnd)
    part.range match {
      case Some((lo, hi)) =>
        // a block can hold keys in [lo, hi] iff key_max >= lo AND
        // key_min <= hi — parquet prunes row groups on stats, then
        // filters block records
        b.withFilter(FilterCompat.get(FilterApi.and(
          FilterApi.gtEq(FilterApi.longColumn("key_max"), Long.box(lo)),
          FilterApi.ltEq(FilterApi.longColumn("key_min"), Long.box(hi))))).build()
      case None => b.build()
    }
  }

  private var nRows = 0
  private var i = 0
  private var current: InternalRow = _
  private var produced = 0L

  override def next(): Boolean = {
    if (limit >= 0 && produced >= limit) return false
    while (i >= nRows) {
      val g = reader.read()
      if (g == null) return false
      var s = 0
      while (s < neededLeaves.length) {
        val n = neededLeaves(s)
        leafArr(s) = AnyColumn.decodeCatalyst(
          kinds(n), g.getBinary(s"pl_${leafIdx(n)}", 0).getBytes).array
        s += 1
      }
      nRows = g.getLong("row_count", 0).toInt
      i = 0
    }
    val vals = new Array[Any](fieldBuilders.length)
    var c = 0
    while (c < fieldBuilders.length) { vals(c) = fieldBuilders(c)(i); c += 1 }
    current = new GenericInternalRow(vals)
    i += 1
    produced += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()
}
