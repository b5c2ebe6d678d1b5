package graft.sinks

import java.util.{Base64, UUID}

import scala.language.existentials
import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/** File-level data skipping (zone maps) for the managed table.
  *
  * The reference's managed write (`bigquery_write.go:327-485`) appends rows
  * and stops; at 100 TB the dominant read cost is scanning files a
  * predicate could never match. This module records per-file column
  * statistics — min / max / null count, lifted from the parquet footers the
  * writer already produced — into a sidecar of the `_graft_manifest`
  * directory at COMMIT time, and [[DataSkipping.readSkipping]] consults
  * them to open only the files whose stats admit the predicate. The same
  * shape as Delta's per-file stats / Iceberg's manifest value ranges:
  * pruning happens on O(files) metadata on the driver, before any Spark
  * scan task is planned.
  *
  * Everything is CONSERVATIVE by construction: a file with no recorded
  * stats for a referenced column (adopted file, unsupported physical type,
  * corrupt footer) is always kept, and the full predicate is re-applied
  * row-wise after the scan — skipping can only remove files that provably
  * contain no matching row, so `readSkipping(dest, fs)` ≡
  * `read(dest).where(fs)` on every input.
  *
  * Statistics collection is O(newly committed files) footer reads —
  * metadata-only, never column data — and only ever for the files a commit
  * adds, not the whole table (the Delta posture: stats ride the commit).
  *
  * Predicates use Spark's public, stable [[org.apache.spark.sql.sources.Filter]]
  * algebra — the same terms the DSv2 pushdown surface speaks — so a caller
  * can hand the exact filters a scan would receive.
  */
object DataSkipping {

  /** Aggregated footer statistics for one column of one file.
    * `lo`/`hi` are None when every value in the file is NULL (the bounds
    * then prune any value comparison); `kind` fixes the comparison domain.
    */
  private[sinks] final case class ColStats(
      kind: String, // "i" integral (int32/int64/date/timestamp-micros), "d" double, "s" utf8 bytes, "b" boolean
      lo: Option[Any],
      hi: Option[Any],
      nullCount: Long,
      rowCount: Long)

  /** Skipping decision for one read: every manifested file, the subset the
    * predicate admits, and how many were pruned purely from metadata.
    */
  final case class SkipReport(totalFiles: Int, keptFiles: Seq[String]) {
    def skipped: Int = totalFiles - keptFiles.size
  }

  // ---------------------------------------------------------------------
  // Stats collection (commit-time, driver-side, metadata-only)
  // ---------------------------------------------------------------------

  /** Read one parquet file's footer and aggregate per-column stats across
    * its row groups. Only top-level primitive columns with footer
    * statistics are recorded; anything else is simply absent (= never
    * pruned on). Row-group stats aggregate as min-of-mins / max-of-maxes /
    * sum-of-nulls; if ANY row group lacks stats for a column, the column
    * is dropped for the whole file (a partial bound is not a bound).
    */
  private def footerStats(fs: FileSystem, file: Path): Map[String, ColStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, fs.getConf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val groups = footer.getBlocks
      if (groups.isEmpty) return Map.empty
      val fields = scala.jdk.CollectionConverters.ListHasAsScala(schema.getFields).asScala
      fields.flatMap { f =>
        if (!f.isPrimitive) None
        else {
          val prim = f.asPrimitiveType()
          val kind = prim.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              // DATE (int32 epoch days) and TIMESTAMP (int64 micros) ride
              // the integral domain; decimals backed by ints do NOT (scale
              // would be lost) and are skipped below.
              prim.getLogicalTypeAnnotation match {
                case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
                case _ => Some("i")
              }
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => Some("d")
            case PrimitiveTypeName.BINARY
                if prim.getLogicalTypeAnnotation
                  .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
              Some("s")
            case PrimitiveTypeName.BOOLEAN => Some("b")
            case _ => None
          }
          kind.flatMap { k =>
            val name = f.getName
            var lo: Option[Any] = None
            var hi: Option[Any] = None
            var nulls = 0L
            var rows = 0L
            var ok = true
            groups.forEach { g =>
              scala.jdk.CollectionConverters
                .ListHasAsScala(g.getColumns).asScala
                .find(c => c.getPath.size() == 1 && c.getPath.toDotString == name)
                .foreach { c =>
                  val st = c.getStatistics
                  rows += g.getRowCount
                  if (st == null || st.isEmpty || !st.isNumNullsSet) ok = false
                  else {
                    nulls += st.getNumNulls
                    if (st.hasNonNullValue) {
                      val (mn, mx) = (normalize(k, st.genericGetMin), normalize(k, st.genericGetMax))
                      lo = Some(lo.fold(mn)(prev => if (cmp(k, mn, prev) < 0) mn else prev))
                      hi = Some(hi.fold(mx)(prev => if (cmp(k, mx, prev) > 0) mx else prev))
                    } else if (st.getNumNulls < g.getRowCount) {
                      // non-null values exist but no bounds recorded
                      ok = false
                    }
                  }
                }
            }
            if (ok && rows > 0) Some(name -> ColStats(k, lo, hi, nulls, rows)) else None
          }
        }
      }.toMap
    } finally reader.close()
  }

  /** Canonical in-memory form per kind: Long for "i"/"b", Double for "d",
    * Array[Byte] for "s" (parquet orders UTF8 binary by UNSIGNED bytes —
    * Java String.compareTo orders by UTF-16 code unit, which disagrees
    * above ASCII, so bounds stay as bytes).
    */
  private def normalize(kind: String, v: Any): Any = kind match {
    case "i" => v.asInstanceOf[Number].longValue()
    case "d" => v.asInstanceOf[Number].doubleValue()
    case "b" => if (v.asInstanceOf[Boolean]) 1L else 0L
    case "s" => v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
  }

  private def cmp(kind: String, a: Any, b: Any): Int = kind match {
    case "i" | "b" => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "d" => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case "s" =>
      java.util.Arrays.compareUnsigned(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }

  // ---------------------------------------------------------------------
  // Sidecar persistence (`_graft_manifest/stats-*.txt`)
  // ---------------------------------------------------------------------

  private def enc(kind: String, v: Option[Any]): String = v match {
    case None => ""
    case Some(x) =>
      kind match {
        case "i" | "b" => x.asInstanceOf[Long].toString
        case "d" => x.asInstanceOf[Double].toString // Double.toString round-trips exactly
        case "s" => Base64.getEncoder.encodeToString(x.asInstanceOf[Array[Byte]])
      }
  }

  private def dec(kind: String, s: String): Option[Any] =
    if (s.isEmpty) None
    else Some(kind match {
      case "i" | "b" => s.toLong
      case "d" => s.toDouble
      case "s" => Base64.getDecoder.decode(s)
    })

  /** Record stats for newly committed `files` (destination-relative) as one
    * sidecar file in the manifest directory. Files are immutable once
    * promoted, so stats lines are write-once facts; a per-file footer
    * failure drops that file's lines (conservative), never the commit.
    * Torn writes can't corrupt readers: the sidecar lands under a
    * dot-prefixed temp name first and is renamed into place.
    */
  private[sinks] def writeStats(fs: FileSystem, destDir: String, files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val lines = files.flatMap { rel =>
      Try(footerStats(fs, new Path(destDir, rel))).toOption.toSeq.flatMap { st =>
        if (st.isEmpty)
          // readable but nothing recordable (e.g. a zero-row file): an
          // empty-column marker keeps indexExisting from re-scanning it
          // — never consulted by pruning (no filter names column "")
          Seq(Seq(rel, "", "_", "", "", "0", "0").mkString("\t"))
        else
          st.toSeq.sortBy(_._1).map { case (c, s) =>
            Seq(rel, c, s.kind, enc(s.kind, s.lo), enc(s.kind, s.hi),
              s.nullCount.toString, s.rowCount.toString).mkString("\t")
          }
      }
    }
    if (lines.isEmpty) return
    val md = new Path(destDir, "_graft_manifest")
    if (!fs.exists(md)) fs.mkdirs(md)
    val tmp = new Path(md, s".tmp-stats-${UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new Path(md, s"stats-${UUID.randomUUID().toString.take(8)}.txt"))
  }

  /** All recorded stats at `destDir`: file → column → stats. Malformed
    * lines are ignored (skipping is advisory metadata; the manifest owns
    * correctness).
    */
  private[graft] def readStats(fs: FileSystem, destDir: String): Map[String, Map[String, ColStats]] = {
    val md = new Path(destDir, "_graft_manifest")
    if (!fs.exists(md)) return Map.empty
    val statFiles = fs.listStatus(md).map(_.getPath)
      .filter(p => p.getName.startsWith("stats-") && p.getName.endsWith(".txt"))
    statFiles.flatMap { p =>
      val in = fs.open(p)
      val ls =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      ls.flatMap { line =>
        line.split("\t", -1) match {
          case Array(f, c, k, mn, mx, nc, rc) =>
            Try(ColStats(k, dec(k, mn), dec(k, mx), nc.toLong, rc.toLong))
              .toOption.map(s => (f, c, s))
          case _ => None
        }
      }
    }.groupBy(_._1)
      .map { case (f, ts) => f -> ts.map(t => t._2 -> t._3).toMap }
  }

  /** Rewrite the sidecar down to `keep` (vacuum support): surviving lines
    * land in a fresh stats file BEFORE the old ones are deleted, so a
    * crash between the two phases leaves duplicate lines (harmless — the
    * reader keys by file) rather than missing ones.
    */
  private[sinks] def compactStats(fs: FileSystem, destDir: String, keep: Set[String]): Unit = {
    val md = new Path(destDir, "_graft_manifest")
    if (!fs.exists(md)) return
    val old = fs.listStatus(md).map(_.getPath)
      .filter(p => p.getName.startsWith("stats-") && p.getName.endsWith(".txt"))
    if (old.isEmpty) return
    val survivors = readStats(fs, destDir).view.filterKeys(keep).toMap
    val lines = survivors.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, s) =>
        Seq(f, c, s.kind, enc(s.kind, s.lo), enc(s.kind, s.hi),
          s.nullCount.toString, s.rowCount.toString).mkString("\t")
      }
    }
    if (lines.nonEmpty) {
      val tmp = new Path(md, s".tmp-stats-${UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      fs.rename(tmp, new Path(md, s"stats-${UUID.randomUUID().toString.take(8)}.txt"))
    }
    old.foreach(p => fs.delete(p, false))
  }

  // ---------------------------------------------------------------------
  // Pruning (might-match evaluation against one file's stats)
  // ---------------------------------------------------------------------

  /** Lift a filter-side literal into a column's comparison domain. None =
    * the literal doesn't fit the domain (type confusion) → conservative.
    */
  private def toDomain(kind: String, v: Any): Option[Any] = (kind, v) match {
    case (_, null) => None
    case ("i", n: java.lang.Number) => Some(n.longValue())
    case ("i", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
    case ("i", d: java.time.LocalDate) => Some(d.toEpochDay)
    case ("i", t: java.sql.Timestamp) =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case ("i", t: java.time.Instant) =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case ("d", n: java.lang.Number) => Some(n.doubleValue())
    case ("s", s: String) => Some(s.getBytes("UTF-8"))
    case ("b", b: java.lang.Boolean) => Some(if (b) 1L else 0L)
    case _ => None
  }

  /** Could any row of a file with stats `st` satisfy `f`? Absent stats →
    * true (keep). The evaluation mirrors what the row-wise filter will do,
    * so a `false` here is a proof, not a guess.
    */
  private[graft] def mightMatch(st: Map[String, ColStats], f: Filter): Boolean = f match {
    case And(l, r) => mightMatch(st, l) && mightMatch(st, r)
    case Or(l, r) => mightMatch(st, l) || mightMatch(st, r)
    case EqualTo(a, v) => rangeMight(st.get(a), v, loOk = _ <= 0, hiOk = _ >= 0)
    case EqualNullSafe(a, null) => st.get(a).forall(_.nullCount > 0)
    case EqualNullSafe(a, v) => rangeMight(st.get(a), v, loOk = _ <= 0, hiOk = _ >= 0)
    case GreaterThan(a, v) => rangeMight(st.get(a), v, loOk = _ => true, hiOk = _ > 0)
    case GreaterThanOrEqual(a, v) => rangeMight(st.get(a), v, loOk = _ => true, hiOk = _ >= 0)
    case LessThan(a, v) => rangeMight(st.get(a), v, loOk = _ < 0, hiOk = _ => true)
    case LessThanOrEqual(a, v) => rangeMight(st.get(a), v, loOk = _ <= 0, hiOk = _ => true)
    case In(a, vs) =>
      st.get(a) match {
        case None => true
        case Some(s) =>
          vs.exists(v => rangeMight(Some(s), v, loOk = _ <= 0, hiOk = _ >= 0))
      }
    case IsNull(a) => st.get(a).forall(_.nullCount > 0)
    case IsNotNull(a) => st.get(a).forall(s => s.nullCount < s.rowCount)
    case StringStartsWith(a, p) =>
      st.get(a) match {
        case None => true
        case Some(s) if s.kind != "s" => true
        case Some(s) =>
          (s.lo, s.hi) match {
            case (Some(lo), Some(hi)) =>
              // any string with prefix p truncates (byte-wise) to exactly p,
              // and truncation is monotone: a match exists only if
              // trunc(lo) <= p <= trunc(hi)
              val pb = p.getBytes("UTF-8")
              val lt = truncBytes(lo.asInstanceOf[Array[Byte]], pb.length)
              val ht = truncBytes(hi.asInstanceOf[Array[Byte]], pb.length)
              java.util.Arrays.compareUnsigned(lt, pb) <= 0 &&
                java.util.Arrays.compareUnsigned(ht, pb) >= 0
            case _ => false // all-null file: no string starts with anything
          }
      }
    case _ => true // unknown term: never prune on it
  }

  private def truncBytes(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length <= n) b else java.util.Arrays.copyOfRange(b, 0, n)

  /** Shared value-vs-[lo,hi] check: keep when the comparison outcomes the
    * predicate needs are possible. All-null files (no bounds) prune every
    * value comparison; a domain-mismatched literal keeps the file.
    */
  private def rangeMight(
      st: Option[ColStats],
      v: Any,
      loOk: Int => Boolean,
      hiOk: Int => Boolean): Boolean = st match {
    case None => true
    case Some(s) =>
      (s.lo, s.hi) match {
        case (Some(lo), Some(hi)) =>
          toDomain(s.kind, v) match {
            case None => v != null // null literal in a value comparison matches nothing
            case Some(dv) => loOk(cmp(s.kind, lo, dv)) && hiOk(cmp(s.kind, hi, dv))
          }
        case _ => false // every row NULL: no value comparison can hold
      }
  }

  /** Does EVERY row of a file with stats `st` satisfy `f`? A `true` here
    * is a proof (value comparisons additionally require a null-free
    * column — NULL satisfies no comparison); `false` just means
    * undecided. The dual of [[mightMatch]], for metadata-only aggregates.
    */
  private def mustMatchAll(st: Map[String, ColStats], f: Filter): Boolean = f match {
    case And(l, r) => mustMatchAll(st, l) && mustMatchAll(st, r)
    case Or(l, r) => mustMatchAll(st, l) || mustMatchAll(st, r)
    case EqualTo(a, v) => boundsAll(st.get(a), v, loOk = _ == 0, hiOk = _ == 0)
    case GreaterThan(a, v) => boundsAll(st.get(a), v, loOk = _ > 0, hiOk = _ => true)
    case GreaterThanOrEqual(a, v) => boundsAll(st.get(a), v, loOk = _ >= 0, hiOk = _ => true)
    case LessThan(a, v) => boundsAll(st.get(a), v, loOk = _ => true, hiOk = _ < 0)
    case LessThanOrEqual(a, v) => boundsAll(st.get(a), v, loOk = _ => true, hiOk = _ <= 0)
    case In(a, vs) =>
      // provable only through a constant column equal to one member
      vs.exists(v => boundsAll(st.get(a), v, loOk = _ == 0, hiOk = _ == 0))
    case IsNull(a) => st.get(a).exists(s => s.nullCount == s.rowCount)
    case IsNotNull(a) => st.get(a).exists(_.nullCount == 0)
    case _ => false
  }

  private def boundsAll(
      st: Option[ColStats],
      v: Any,
      loOk: Int => Boolean,
      hiOk: Int => Boolean): Boolean = st match {
    case Some(s) if s.nullCount == 0 =>
      (s.lo, s.hi) match {
        case (Some(lo), Some(hi)) =>
          toDomain(s.kind, v) match {
            case Some(dv) => loOk(cmp(s.kind, lo, dv)) && hiOk(cmp(s.kind, hi, dv))
            case None => false
          }
        case _ => false
      }
    case _ => false
  }

  /** Metadata split for a count: files the predicate provably misses
    * entirely (dropped), provably matches entirely (counted from recorded
    * row counts, no scan), and the undecided remainder (scanned).
    */
  final case class CountPlan(
      prunedFiles: Int, decidedFiles: Int, decidedRows: Long, scanFiles: Seq[String])

  private[graft] def countPlan(
      spark: SparkSession, destDir: String, filters: Seq[Filter]): CountPlan = {
    val fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ManagedWriter.manifestFiles(fs, destDir)
    val stats = readStats(fs, destDir)
    var pruned = 0
    var decided = 0
    var decidedRows = 0L
    val scan = Seq.newBuilder[String]
    files.foreach { f =>
      val st = stats.getOrElse(f, Map.empty)
      if (!filters.forall(mightMatch(st, _))) pruned += 1
      else if (st.nonEmpty && filters.forall(mustMatchAll(st, _))) {
        decided += 1
        decidedRows += st.valuesIterator.next().rowCount
      } else scan += f
    }
    CountPlan(pruned, decided, decidedRows, scan.result())
  }

  /** `COUNT(*)` under `filters`, answered from metadata wherever the
    * stats decide a whole file (Iceberg's metadata-aggregate shape): only
    * the undecided files are scanned, with the full predicate re-applied
    * there — so the count is exact on every input, and on
    * range-partitioned layouts a range count touches at most the two
    * boundary files.
    */
  def countWhere(spark: SparkSession, destDir: String, filters: Seq[Filter]): Long = {
    val residual = filters.map(f =>
      toColumn(f).getOrElse(throw new IllegalArgumentException(
        s"unsupported residual filter: $f")))
    val plan = countPlan(spark, destDir, filters)
    val scanned =
      if (plan.scanFiles.isEmpty) 0L
      else residual.foldLeft(
        ManagedWriter.readFiles(spark, destDir, plan.scanFiles))(_.where(_)).count()
    plan.decidedRows + scanned
  }

  // ---------------------------------------------------------------------
  // Residual conversion (Filter → Column, applied after the pruned scan)
  // ---------------------------------------------------------------------

  private def toColumn(f: Filter): Option[Column] = f match {
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(c) => toColumn(c).map(!_)
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case StringContains(a, p) => Some(col(a).contains(p))
    case _ => None
  }

  // ---------------------------------------------------------------------
  // Per-file Bloom filters (parquet-native point-lookup skipping)
  // ---------------------------------------------------------------------

  /** Writer options that make the parquet writer embed a split-block Bloom
    * filter for each named column in every produced file (computed inside
    * the data write itself — no extra pass, no sidecar; the filter lives in
    * the file the way Delta's bloom index and Iceberg's ndv metrics ride
    * the data). Probe side: [[readSkippingBloom]].
    */
  def bloomWriteOptions(cols: Seq[String], expectedNdv: Long = 100000L): Map[String, String] =
    cols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString)).toMap

  /** Lift an equality literal into a column's parquet physical domain for
    * bloom hashing; None = unconvertible → conservative keep.
    */
  private def toParquetValue(
      prim: org.apache.parquet.schema.PrimitiveType, v: Any): Option[Any] = {
    val isString = prim.getLogicalTypeAnnotation
      .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
    (prim.getPrimitiveTypeName, v) match {
      case (PrimitiveTypeName.INT64, n: java.lang.Number) =>
        Some(java.lang.Long.valueOf(n.longValue()))
      case (PrimitiveTypeName.INT32, n: java.lang.Number) =>
        Some(java.lang.Integer.valueOf(n.intValue()))
      case (PrimitiveTypeName.DOUBLE, n: java.lang.Number) =>
        Some(java.lang.Double.valueOf(n.doubleValue()))
      case (PrimitiveTypeName.FLOAT, n: java.lang.Number) =>
        Some(java.lang.Float.valueOf(n.floatValue()))
      case (PrimitiveTypeName.BINARY, s: String) if isString =>
        Some(org.apache.parquet.io.api.Binary.fromString(s))
      case _ => None
    }
  }

  /** Could the file contain ANY of `values` in `column`, according to its
    * embedded parquet Bloom filters? `true` is the conservative default
    * (no bloom in some row group, unknown column, unconvertible literal);
    * `false` is a proof of absence (modulo the bloom's zero
    * false-negative guarantee). Cost: one footer read plus the bloom
    * bitset pages (KB-sized) — never column data.
    */
  private def bloomAdmits(
      fs: FileSystem, destDir: String, rel: String,
      column: String, values: Seq[Any]): Boolean = {
    val opened = Try(ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(destDir, rel), fs.getConf)))
    opened.fold(_ => true, { reader =>
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        val field = scala.jdk.CollectionConverters
          .ListHasAsScala(schema.getFields).asScala
          .find(f => f.getName == column && f.isPrimitive)
        field match {
          case None => true
          case Some(f) =>
            val converted = values.map(toParquetValue(f.asPrimitiveType(), _))
            if (converted.exists(_.isEmpty)) true
            else {
              val vs = converted.flatten
              var allGroupsHaveBloom = true
              var might = false
              reader.getFooter.getBlocks.forEach { g =>
                if (!might && allGroupsHaveBloom) {
                  scala.jdk.CollectionConverters
                    .ListHasAsScala(g.getColumns).asScala
                    .find(c => c.getPath.size() == 1 && c.getPath.toDotString == column) match {
                    case None => allGroupsHaveBloom = false
                    case Some(cc) =>
                      val bf = reader.getBloomFilterDataReader(g).readBloomFilter(cc)
                      if (bf == null) allGroupsHaveBloom = false
                      else if (vs.exists {
                        case l: java.lang.Long => bf.findHash(bf.hash(l.longValue()))
                        case i: java.lang.Integer => bf.findHash(bf.hash(i.intValue()))
                        case d: java.lang.Double => bf.findHash(bf.hash(d.doubleValue()))
                        case fl: java.lang.Float => bf.findHash(bf.hash(fl.floatValue()))
                        case b: org.apache.parquet.io.api.Binary => bf.findHash(bf.hash(b))
                        case _ => true
                      }) might = true
                  }
                }
              }
              if (!allGroupsHaveBloom) true else might
            }
        }
      } finally reader.close()
    })
  }

  /** The point-lookup terms a Bloom filter can prove absent: top-level
    * (AND-composed) equality and IN terms with non-null literals. OR
    * branches and other shapes stay zone-map-only (conservative).
    */
  private def eqTerms(f: Filter): Seq[(String, Seq[Any])] = f match {
    case And(l, r) => eqTerms(l) ++ eqTerms(r)
    case EqualTo(a, v) if v != null => Seq(a -> Seq(v))
    case EqualNullSafe(a, v) if v != null => Seq(a -> Seq(v))
    case In(a, vs) if vs.nonEmpty && !vs.contains(null) => Seq(a -> vs.toSeq)
    case _ => Nil
  }

  /** [[report]] plus per-file Bloom probing for the predicate's equality /
    * IN terms — the high-cardinality point-lookup case where min/max zone
    * maps can't prune (every file spans the full key range) but a Bloom
    * proves per-file absence. Probing is driver-side O(zone-kept files ×
    * row groups) bloom-page reads, on the already-zone-pruned candidate
    * list only.
    */
  def reportBloom(spark: SparkSession, destDir: String, filters: Seq[Filter]): SkipReport = {
    val zone = report(spark, destDir, filters)
    val terms = filters.flatMap(eqTerms)
    if (terms.isEmpty) return zone
    val fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kept = zone.keptFiles.filter { f =>
      terms.forall { case (c, vs) => bloomAdmits(fs, destDir, f, c, vs) }
    }
    SkipReport(zone.totalFiles, kept)
  }

  /** Collect a BOUNDED probe-key list for [[readSkippingBloom]]'s
    * `In`-filter path. The point-lookup contract: an `In` filter carries
    * LITERAL keys by nature, so the probe set must be driver-sized —
    * this helper enforces that with a hard cap instead of an unbounded
    * `collect()` (at 1% of a 100 TB table the collect IS the
    * bottleneck). A probe set that outgrows the cap is not a point
    * lookup any more: route it through `ops.Sketch.bloomSemiJoin`
    * (C77), which screens row-side with no driver materialization.
    */
  def probeKeys(df: DataFrame, keyCol: String, maxKeys: Int = 10000): Array[Any] = {
    val ks = df.select(keyCol).distinct().limit(maxKeys + 1)
      .collect().map(_.get(0))
    require(ks.length <= maxKeys,
      s"probe set exceeds $maxKeys keys — not a point lookup; " +
        "use Sketch.bloomSemiJoin for corpus-scale probes")
    ks
  }

  /** [[readSkipping]] with Bloom-filter point-lookup pruning on top of the
    * zone maps; same exactness contract — the full predicate is re-applied
    * row-wise, so the result is exactly `read(destDir).where(filters)`.
    */
  def readSkippingBloom(spark: SparkSession, destDir: String, filters: Seq[Filter]): DataFrame = {
    val residual = filters.map(f =>
      toColumn(f).getOrElse(throw new IllegalArgumentException(
        s"unsupported residual filter: $f")))
    val rep = reportBloom(spark, destDir, filters)
    val base = ManagedWriter.readFiles(spark, destDir, rep.keptFiles)
    residual.foldLeft(base)(_.where(_))
  }

  /** Opt-in stats backfill for files the manifest names but no sidecar
    * covers — ADOPTED files (a pre-existing dataset the first commit took
    * over, deliberately not footer-scanned then: adoption is implicit and
    * the directory could hold millions of files, so the scan must be an
    * explicit choice). After indexing, skipping over the adopted layout —
    * e.g. a Z-ordered table — is as effective as over written-through
    * data. Returns the number of files indexed; O(that) footer reads.
    */
  def indexExisting(spark: SparkSession, destDir: String): Int = {
    val fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ManagedWriter.manifestFiles(fs, destDir)
    val covered = readStats(fs, destDir).keySet
    val missing = files.filterNot(covered)
    writeStats(fs, destDir, missing)
    missing.size
  }

  // ---------------------------------------------------------------------
  // Public read path
  // ---------------------------------------------------------------------

  /** The skipping decision for `filters` at `destDir`, without reading any
    * data: every file the latest manifest names vs the subset whose stats
    * admit the predicate. Exposed so callers (and specs) can measure
    * pruning — the whole point of the feature at 100 TB.
    */
  def report(spark: SparkSession, destDir: String, filters: Seq[Filter]): SkipReport = {
    val fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ManagedWriter.manifestFiles(fs, destDir)
    val stats = readStats(fs, destDir)
    val kept = files.filter { f =>
      val st = stats.getOrElse(f, Map.empty)
      filters.forall(mightMatch(st, _))
    }
    SkipReport(files.size, kept)
  }

  /** Read the latest committed snapshot under `filters`, opening ONLY the
    * files whose recorded stats admit the predicate; the predicate is then
    * re-applied row-wise, so the result is exactly
    * `ManagedWriter.read(destDir).where(filters)` — skipping changes which
    * files are scanned, never which rows come back. Every filter must be
    * expressible as a Column (it is for the whole
    * [[org.apache.spark.sql.sources.Filter]] vocabulary this module
    * handles); an inexpressible term throws rather than silently widening
    * the result.
    */
  def readSkipping(spark: SparkSession, destDir: String, filters: Seq[Filter]): DataFrame = {
    val residual = filters.map(f =>
      toColumn(f).getOrElse(throw new IllegalArgumentException(
        s"unsupported residual filter: $f")))
    val rep = report(spark, destDir, filters)
    val base = ManagedWriter.readFiles(spark, destDir, rep.keptFiles)
    residual.foldLeft(base)(_.where(_))
  }
}
