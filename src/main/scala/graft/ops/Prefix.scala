package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix (running) aggregation over a GLOBAL sort order.
  *
  * A `Window.orderBy(t)` with no partition key is a single-task sort in
  * Spark — the whole input lands on one executor thread, which is exactly
  * the shape that dies first at 100 TB. The classic fix is the two-phase
  * scan: range-partition on the order key, run the prefix pass inside each
  * partition, and carry cross-partition state through a tiny per-partition
  * summary (one row per range partition) whose own prefix scan is
  * negligible (bounded by the partition count, not the data).
  *
  * The LOCAL pass is a run-buffered mapPartitions kernel over the
  * range-sorted partition, not a `Window.partitionBy(pid)`: Catalyst
  * cannot know that range partitioning already clusters rows by their own
  * partition id, so the window spelling paid a SECOND full-data hash
  * exchange on the pid plus the WindowExec sort (measured in the round-10
  * plan) — at 100 TB that extra shuffle is the whole bill. The kernel
  * reads the partition exactly as the range exchange + in-partition sort
  * left it: zero additional shuffles. This is the documented
  * per-partition-imperative exception class (a sort-order-dependent scan
  * no declarative operator expresses without re-exchanging).
  *
  * Equal order-key values always co-locate (RangePartitioner maps equal
  * keys to the same partition), so "strictly earlier partition" ⇒
  * "strictly smaller key" and the per-partition offset is exact. Results
  * are partition-count-invariant: the offsets compensate wherever the
  * range cuts fall. Both branches hang off the SAME range exchange in one
  * plan, so exchange/stage reuse computes the input once per action plus
  * the range-sampling pass.
  *
  * The partition identity that links a row to its offset is DATA-DERIVED
  * — the partition's minimum order key — never
  * `TaskContext.getPartitionId()`. Range partitions hold disjoint key
  * ranges and equal keys co-locate, so non-empty partitions have distinct
  * min-keys and ascending min-key IS the partition order. The task
  * partition id, by contrast, is whatever id space the CONSUMING plan
  * wraps the kernel in: measured here, AQE re-planned a downstream
  * non-equi join into a nested-loop scan whose stage re-read each range
  * bucket once per probe chunk with fresh task ids (3 buckets → 12 task
  * partitions), so pid-keyed offsets matched garbage and the composed
  * query silently duplicated and dropped rows. A min-key identity is
  * invariant under any such re-evaluation or re-wrapping.
  *
  * Used by [[TimeSeries.peakConcurrency]] (running sum of +1/−1 session
  * boundaries) and [[Skyline.skyline2D]] (running min over strictly
  * smaller x).
  */
// Serializable: the kernel closures are built by local helper defs
// (runTotals/runMins), and a lifted local def eta-expanded into a
// mapPartitions lambda captures the enclosing module instance — the
// module is stateless, so shipping it is free.
object Prefix extends Serializable {

  private val PidCol = "__graft_pid"

  /** `df` extended with `outCol` = running SUM of `valueCol` in ascending
    * `orderCol` order, where every row with the SAME `orderCol` value gets
    * the SAME running total (the "after processing all rows at t" value —
    * peers are included, matching a RANGE-frame running sum; rows before
    * the first non-null value carry null, matching window-sum semantics).
    * `orderCol` must be an integral column; `valueCol` a long.
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String, outCol: String): DataFrame = {
    requireIntegral(df, "runningSum", orderCol, valueCol)
    val n = rangeWidth(df)
    val ranged = rangedSorted(df, orderCol, n)
    val schema = ranged.schema
    val oi = schema.fieldIndex(orderCol)
    val vi = schema.fieldIndex(valueCol)
    def runTotals(rows: Iterator[Row], withPid: Boolean): Iterator[Row] =
      runIterator[Long](rows, oi) { (pidKey, buf, state) =>
        var runSum = 0L
        var runSeen = false
        buf.foreach { r =>
          val v = r.get(vi)
          if (v != null) { runSum += v.asInstanceOf[Number].longValue(); runSeen = true }
        }
        val acc = state match {
          case Some(prev) => prev + runSum
          case None => runSum
        }
        val nextState = if (runSeen || state.isDefined) Some(acc) else None
        val total: Any = nextState.map(Long.box).orNull
        val out =
          if (withPid) buf.map(r => Row.fromSeq(r.toSeq :+ pidKey :+ total))
          else buf.map(r => Row.fromSeq(r.toSeq :+ total))
        (out, nextState)
      }
    if (n == 1) {
      // Single range partition (the toy-scale / bounded-dim case): the
      // local pass IS the global prefix — no partition identity, no
      // offsets branch, no join, and only ONE sort+kernel execution
      // (the two-consumer spelling below re-runs the sort + kernel for
      // the offsets aggregate; ns218's dump showed those duplicate
      // 32-task sorts reserving multi-GB page sets to scan 15k rows).
      val outSchema1 = schema.add(outCol, LongType, nullable = true)
      return ranged.mapPartitions(runTotals(_, withPid = false))(Encoders.row(outSchema1))
    }
    val outSchema = schema
      .add(PidCol, LongType, nullable = false)
      .add(outCol, LongType, nullable = true)
    val local = ranged.mapPartitions(runTotals(_, withPid = true))(Encoders.row(outSchema))
    // One row per range partition; the exclusive prefix over it is a
    // window over ≤ #partitions rows — bounded by cluster layout, not data.
    // The offsets aggregate over the KERNEL OUTPUT, not a parallel
    // branch of the input: a parallel branch's range exchange canonicalizes
    // differently (column pruning reaches it), so ReuseExchange cannot
    // dedupe the two exchanges and each samples its OWN range boundaries
    // (RangePartitioner seeds by rdd id) — divergent boundaries mean
    // divergent pids and a silently wrong (or row-dropping) offset join.
    // Deriving both sides from `local` makes the exchange subtrees
    // literally identical — the kernel is an object boundary no pruning
    // crosses — so the shuffle is computed once and the pids are the same
    // partitions by construction.
    val prior = Window.orderBy(PidCol).rowsBetween(Window.unboundedPreceding, -1)
    // Cast before summing: valueCol may be Decimal(<=18,0) (accepted by
    // requireIntegral), and an uncast decimal sum would make __offset
    // DecimalType — the final when() would then coerce the Long kernel
    // output to Decimal, so outCol's type would depend on the partition
    // count (Long when n==1, Decimal when n>1).
    val offsets = local
      .groupBy(col(PidCol)).agg(
        sum(col(valueCol).cast("long")).as("__part_sum"),
        count(col(valueCol)).as("__part_cnt"))
      .withColumn("__offset", coalesce(sum(col("__part_sum")).over(prior), lit(0L)))
      // whether ANY strictly-earlier partition saw a non-null value: a row
      // whose partition-local prefix is still null (leading all-null run)
      // must carry the prior partitions' running total, not null — the
      // result may not depend on where the range cuts fall.
      .withColumn("__has_prior", coalesce(sum(col("__part_cnt")).over(prior), lit(0L)) > lit(0L))
      .select(col(PidCol), col("__offset"), col("__has_prior"))
    local
      .join(broadcast(offsets), PidCol)
      .withColumn(
        outCol,
        when(col(outCol).isNotNull, col(outCol) + col("__offset"))
          .when(col("__has_prior"), col("__offset"))
          .otherwise(lit(null).cast(LongType)))
      .drop(PidCol, "__offset", "__has_prior")
  }

  /** `df` extended with `beforeOut` = running MIN of `valueCol` over all
    * rows with STRICTLY smaller `orderCol` (null when no such row exists)
    * and `peersOut` = MIN of `valueCol` over the rows with EQUAL
    * `orderCol`. Both come out of ONE run-buffered pass over the
    * range-sorted partition. `orderCol` and `valueCol` must be integral
    * (the out columns are LongType); equal order values always co-locate
    * in one range partition, so the strictly-before offset from earlier
    * partitions is exact.
    */
  def runningMinBeforeWithPeers(
      df: DataFrame, orderCol: String, valueCol: String,
      beforeOut: String, peersOut: String): DataFrame = {
    requireIntegral(df, "runningMinBeforeWithPeers", orderCol, valueCol)
    val n = rangeWidth(df)
    val ranged = rangedSorted(df, orderCol, n)
    val schema = ranged.schema
    val oi = schema.fieldIndex(orderCol)
    val vi = schema.fieldIndex(valueCol)
    def runMins(rows: Iterator[Row], withPid: Boolean): Iterator[Row] =
      // state = the running min over all strictly-earlier rows (None until
      // a non-null value is seen)
      runIterator[Long](rows, oi) { (pidKey, buf, state) =>
        var runMin = Long.MaxValue
        var runSeen = false
        buf.foreach { r =>
          val v = r.get(vi)
          if (v != null) {
            val l = v.asInstanceOf[Number].longValue()
            if (l < runMin) runMin = l
            runSeen = true
          }
        }
        val before: Any = state.map(Long.box).orNull
        val peers: Any = if (runSeen) runMin else null
        val nextState = (state, runSeen) match {
          case (Some(m), true) => Some(math.min(m, runMin))
          case (Some(m), false) => Some(m)
          case (None, true) => Some(runMin)
          case (None, false) => None
        }
        val out =
          if (withPid) buf.map(r => Row.fromSeq(r.toSeq :+ pidKey :+ before :+ peers))
          else buf.map(r => Row.fromSeq(r.toSeq :+ before :+ peers))
        (out, nextState)
      }
    if (n == 1) {
      // Single range partition: the local pass is already global — same
      // single-execution fast path as runningSum.
      val outSchema1 = schema
        .add(beforeOut, LongType, nullable = true)
        .add(peersOut, LongType, nullable = true)
      return ranged.mapPartitions(runMins(_, withPid = false))(Encoders.row(outSchema1))
    }
    val outSchema = schema
      .add(PidCol, LongType, nullable = false)
      .add(beforeOut, LongType, nullable = true)
      .add(peersOut, LongType, nullable = true)
    val local = ranged.mapPartitions(runMins(_, withPid = true))(Encoders.row(outSchema))
    // same single-exchange discipline as runningSum: aggregate the
    // kernel output so both join sides share one reused shuffle
    val offsets = local
      .groupBy(col(PidCol)).agg(min(col(valueCol)).cast("long").as("__part_min"))
      .withColumn(
        "__offset",
        min(col("__part_min")).over(
          Window.orderBy(PidCol).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(PidCol), col("__offset"))
    // least() skips nulls: null local + non-null offset (first row of a
    // later partition) resolves to the offset, and vice versa.
    local
      .join(broadcast(offsets), PidCol)
      .withColumn(beforeOut, least(col(beforeOut), col("__offset")))
      .drop(PidCol, "__offset")
  }

  /** `df` extended with `outCol` = the global `row_number()` over the
    * total order (`valueCol` asc-or-desc, `idCol` asc) — distributed.
    *
    * The naive spelling, `row_number().over(Window.orderBy(v, id))`, is
    * a single-task sort over the whole input. The tempting half-fix —
    * rank within `Window.partitionBy(v)` plus a prefix count of rows
    * with smaller `v` — re-introduces a HOT partition whenever one value
    * dominates (a frequency metric where half the entities have f = 1).
    * This kernel instead range-partitions on the COMPOSITE key: the
    * RangePartitioner splits big peer groups across partitions evenly
    * (the id tiebreak makes every key unique), each partition indexes
    * its rows locally in one streamed pass, and a per-partition count
    * summary (≤ #partitions rows — bounded by cluster layout, not data)
    * supplies the exclusive offsets. Same single-exchange discipline as
    * [[runningSum]]: the offsets branch aggregates the KERNEL OUTPUT so
    * both join sides share one reused shuffle.
    *
    * Partition identity is data-derived — the partition's FIRST
    * composite key in sort order, unique because non-empty range
    * partitions hold disjoint key ranges — never the task partition id
    * (see the class doc for why pids lie under AQE re-wrapping).
    *
    * The exchange width is ADAPTIVE: `ceil(plan-stats bytes /`
    * [[TargetPartitionBytesKey]]`)`, clamped to the session shuffle
    * parallelism — a 100 TB entity dim fans out to the cluster, while a
    * catalog-sized dim collapses to ONE range partition, where the
    * local index IS the global rank, the RangePartitioner never samples
    * (no bounds needed for one partition), and the offsets pass
    * disappears. Measured: the fixed-width spelling cost the sf0.1 RFM
    * gate 2.6 s of 32-task page-allocation churn to rank 1,500 rows —
    * the same class of toy-scale exchange tax the round-12 Par.spread
    * regression taught. Stats only, never an action (the Par.spread
    * rule); width 1 costs what the single-task window it replaces cost,
    * so the swap is free at small scale and distributed at large.
    *
    * Contract: `valueCol` and `idCol` are non-null integral columns and
    * `(valueCol, idCol)` is unique per row (idCol a key). `desc = true`
    * ranks largest value first; ties always break by ascending id.
    */
  def rowNumber(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      outCol: String,
      desc: Boolean = false): DataFrame =
    rowNumberAt(df, valueCol, idCol, outCol, desc, rangeWidth(df))

  /** [[rowNumber]] with an EXPLICIT exchange width, for chained passes:
    * plan stats over a previous pass's output are size-only JOIN
    * estimates (the product of child sizes), so a second pass reading
    * pass one would overshoot to full session parallelism even on a
    * small dim (measured: the rfm triple crept 0.213 → 0.321 s at sf0.1
    * from exactly that). Compute the width ONCE from the (checkpointed)
    * base's exact stats and thread it through every pass.
    */
  def rowNumber(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      outCol: String,
      desc: Boolean,
      width: Int): DataFrame = {
    require(width >= 1, "width must be >= 1")
    rowNumberAt(df, valueCol, idCol, outCol, desc, width)
  }

  private def rowNumberAt(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      outCol: String,
      desc: Boolean,
      n: Int): DataFrame = {
    requireIntegral(df, "rowNumber", valueCol, idCol)
    val vCol = if (desc) col(valueCol).desc else col(valueCol).asc
    val ranged = df
      .repartitionByRange(n, vCol, col(idCol).asc)
      .sortWithinPartitions(vCol, col(idCol).asc)
    val schema = ranged.schema
    val vi = schema.fieldIndex(valueCol)
    val ii = schema.fieldIndex(idCol)
    if (n == 1) {
      // Single range partition: the streamed local index is already the
      // global rank — no partition identity, no offsets, no join.
      val outSchema1 = schema.add(outCol, LongType, nullable = false)
      return ranged.mapPartitions { rows =>
        var idx = 0L
        rows.map { r =>
          require(r.get(vi) != null && r.get(ii) != null,
            "Prefix.rowNumber: value and id columns must be non-null")
          idx += 1L
          Row.fromSeq(r.toSeq :+ idx)
        }
      }(Encoders.row(outSchema1))
    }
    val outSchema = schema
      .add(PidVCol, LongType, nullable = false)
      .add(PidICol, LongType, nullable = false)
      .add(IdxCol, LongType, nullable = false)
    val local = ranged.mapPartitions { rows =>
      var idx = 0L
      var pv = 0L
      var pi = 0L
      rows.map { r =>
        val v = r.get(vi)
        val id = r.get(ii)
        // every row, not just the partition head: under desc ordering a
        // null value sorts LAST and would otherwise rank silently
        require(v != null && id != null,
          "Prefix.rowNumber: value and id columns must be non-null")
        if (idx == 0L) {
          pv = v.asInstanceOf[Number].longValue()
          pi = id.asInstanceOf[Number].longValue()
        }
        idx += 1L
        Row.fromSeq(r.toSeq :+ pv :+ pi :+ idx)
      }
    }(Encoders.row(outSchema))
    // Partition order = ascending first-key in the SAME direction the
    // range exchange used; the exclusive prefix over the per-partition
    // counts is a window over ≤ #partitions rows.
    val pidOrd =
      if (desc) Seq(col(PidVCol).desc, col(PidICol).asc)
      else Seq(col(PidVCol).asc, col(PidICol).asc)
    val prior = Window.orderBy(pidOrd: _*).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col(PidVCol), col(PidICol))
      .agg(count(lit(1)).as("__part_n"))
      .withColumn("__offset", coalesce(sum(col("__part_n")).over(prior), lit(0L)))
      .select(col(PidVCol), col(PidICol), col("__offset"))
    local
      .join(broadcast(offsets), Seq(PidVCol, PidICol))
      .withColumn(outCol, (col("__offset") + col(IdxCol)).cast(LongType))
      .drop(PidVCol, PidICol, IdxCol, "__offset")
  }

  private val PidVCol = "__graft_pid_v"
  private val PidICol = "__graft_pid_i"
  private val IdxCol = "__graft_idx"

  /** Session conf key: target bytes per range partition for
    * [[rowNumber]]'s adaptive exchange width (default 64 MB — a
    * comfortable single-task sort). Lower it in tests to force the
    * multi-partition kernel on small fixtures.
    */
  val TargetPartitionBytesKey = "spark.graft.prefix.targetPartitionBytes"

  /** Range-partition on the order key with an EXPLICIT partition count
    * (the session's shuffle parallelism) and sort within partitions. The
    * explicit count matters for correctness, not tuning: a bare
    * repartitionByRange is REPARTITION_BY_COL, which AQE may coalesce
    * per CONSUMER stage — measured here coalescing the offsets branch's
    * read to one task while the probe branch kept all partitions. The
    * min-key identities are derived from whatever partition layout each
    * kernel pass actually reads, so the two passes must read the SAME
    * layout for the offset join's key sets to line up; REPARTITION_BY_NUM
    * pins the partition count on every consumer, keeping the merged/
    * unmerged read ambiguity out of the plan entirely.
    */
  private def rangedSorted(df: DataFrame, orderCol: String, n: Int): DataFrame =
    df.repartitionByRange(n, col(orderCol)).sortWithinPartitions(col(orderCol))

  /** Adaptive range-exchange width shared by every prefix kernel:
    * `ceil(plan-stats bytes / [[TargetPartitionBytesKey]])`, clamped to
    * the session's shuffle parallelism — a 100 TB input fans out to the
    * cluster while a catalog-sized dim collapses to ONE range partition
    * (no sampling pass, no offsets branch — see the n == 1 fast paths).
    * Stats only, never an action. The fixed-width spelling measured
    * multi-GB sort-page reservations across 32 tasks to scan 10–15k
    * rows (ns218, round 13) — the same toy-scale exchange tax the
    * round-12 Par.spread regression taught.
    */
  private[ops] def rangeWidth(df: DataFrame): Int = {
    val conf = df.sparkSession.conf
    val sessionN = conf.get("spark.sql.shuffle.partitions").toInt
    val target = conf.get(TargetPartitionBytesKey, (64L << 20).toString).toLong
    val statsBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((statsBytes + target - 1) / target)
      .min(BigInt(sessionN)).max(BigInt(1)).toInt
  }

  /** The order/value/id columns every kernel here longValue()s into its
    * partition identities and offsets MUST be integral — a Double/Float/
    * wide Decimal is also a `Number`, so it would silently truncate:
    * truncated identities can tie across partitions, mis-order the
    * offsets window against range order, and fan out rows through the
    * offsets join. Enforce at the API boundary (the Similarity.topKRouted
    * precedent), not in the task where it dies late and
    * partition-dependently.
    *
    * Decimal(p ≤ 18, scale 0) IS accepted: its values are integral BY
    * SCHEMA and fit a Long exactly, so `longValue()` is lossless — the
    * type a SQL layer hands back for COUNT/SUM-of-int columns. The
    * Double/Float rejection is INTENTIONAL even for whole-number data:
    * "whole" there is the caller's claim, not the schema's guarantee —
    * callers with known-integral doubles cast explicitly.
    */
  private def requireIntegral(df: DataFrame, op: String, cols: String*): Unit =
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      val ok = dt match {
        case org.apache.spark.sql.types.ByteType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.IntegerType | LongType => true
        case d: org.apache.spark.sql.types.DecimalType =>
          d.scale == 0 && d.precision <= 18
        case _ => false
      }
      require(
        ok,
        s"Prefix.$op: column '$c' must be integral " +
          s"(Byte/Short/Int/Long, or Decimal(<=18, 0)), got $dt")
    }

  /** Streams a sorted partition as RUNS of equal `orderCol` values:
    * `emit(partKey, run, state)` maps each buffered run plus the carried
    * state to (output rows, next state). Peer rows therefore share one
    * computed value — the RANGE-frame semantics — while memory is bounded
    * by the largest peer group, never the partition. The emitted
    * collection is materialized per run (the buffer is reused), so `emit`
    * must not return a lazy view over it — `ArrayBuffer.map` (strict) is
    * safe.
    *
    * `partKey` is the partition's identity: its FIRST (minimum) order-key
    * value as a boxed Long, identical for every run of the partition.
    * Order keys must be non-null — the sort puts nulls first, so a null
    * key would poison the identity; fail fast instead of joining wrong.
    */
  private def runIterator[S](rows: Iterator[Row], keyIdx: Int)(
      emit: (java.lang.Long, scala.collection.mutable.ArrayBuffer[Row], Option[S])
        => (scala.collection.Seq[Row], Option[S])): Iterator[Row] =
    new Iterator[Row] {
      private val buf = new scala.collection.mutable.ArrayBuffer[Row]()
      private var out: Iterator[Row] = Iterator.empty
      private var pending: Row = _
      private var state: Option[S] = None
      private var partKey: java.lang.Long = _
      override def hasNext: Boolean = out.hasNext || pending != null || rows.hasNext
      override def next(): Row = {
        if (!out.hasNext) advance()
        out.next()
      }
      private def advance(): Unit = {
        buf.clear()
        if (pending == null) pending = rows.next()
        val key = pending.get(keyIdx)
        if (partKey == null) {
          require(key != null, "Prefix: order column must be non-null")
          partKey = Long.box(key.asInstanceOf[Number].longValue())
        }
        buf += pending
        pending = null
        var open = true
        while (open && rows.hasNext) {
          val r = rows.next()
          if (r.get(keyIdx) == key) buf += r
          else { pending = r; open = false }
        }
        val (emitted, nextState) = emit(partKey, buf, state)
        state = nextState
        out = emitted.iterator
      }
    }
}
