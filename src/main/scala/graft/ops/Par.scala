package graft.ops

import scala.annotation.tailrec
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{CoalesceExec, ExecSubqueryExpression, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{
  ENSURE_REQUIREMENTS, REBALANCE_PARTITIONS_BY_COL, REBALANCE_PARTITIONS_BY_NONE,
  REPARTITION_BY_COL, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{
  BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Parallelism guard for fan-out-heavy kernels.
  *
  * A small or single-split scan hands the whole downstream pipeline ONE
  * task (a one-row-group parquet file is unsplittable by byte range), so
  * an operator whose work fans out far beyond its input bytes — a CMS
  * depth-explode, a per-row image decode, B bootstrap replicates per row,
  * an all-pairs cosine probe — serializes on a single core no matter how
  * many the session has (measured: ns68's 1M-row sketch build spent 2.5 s
  * in one task at sf0.1 on 32 cores).
  *
  * [[spread]] widens such a frame toward the session's shuffle
  * parallelism — but ONLY when the exchange it adds is worth buying.
  * Round 12 shipped an ungated spread and the driver bench confirmed the
  * cost side: the sf0.1 PNG-decode gate (ns67) regressed 0.825 → 1.852 s
  * because the added exchange exceeded the half-second of decode it
  * parallelized. Round 13 gated it on NODE PRESENCE ("plan contains a
  * Join/Aggregate ⇒ arrives at shuffle width") and the driver bench
  * confirmed THAT cost side too: a BroadcastHashJoin/
  * BroadcastNestedLoopJoin keeps the STREAMED side's narrow layout (the
  * build side shuffles, the probe side never does), so six compute-heavy
  * kernels above broadcast joins serialized on the scan's 1–2 splits
  * (ns229 silhouette 1.4 → 3.7 s: the whole query was one
  * WholeStageCodegen pipeline over a 2-batch scan feeding a BNLJ against
  * a 1-row broadcast). The gate below therefore reasons about the
  * PHYSICAL LAYOUT PATH — the chain of operators that determines the
  * frame's partitioning — never about which nodes exist somewhere in the
  * plan.
  */
object Par {

  /** Work-equivalent bytes a single task should own before a widening
    * exchange pays for itself. Calibrated from the round-12 forensics:
    * the sf0.1 exchange + re-execution overhead the spread adds is
    * ~0.2–1 s wall-clock, so the single-task latency it removes must be
    * at least that — about 64 MB of scan-equivalent work at the ~60–100
    * MB/s effective throughput the fan-out kernels sustain per core.
    * Doubles as the per-task work target when sizing the widened
    * exchange: `width = ceil(work / MinWorkBytes)` gives every task
    * about one exchange-worthy quantum.
    */
  val MinWorkBytes: Long = 64L << 20

  /** Per-task work quantum when SIZING the widened exchange. Distinct
    * from the gate: whether to pay the exchange at all is a bytes-moved
    * question ([[MinWorkBytes]] of work vs ~0.2–1 s of exchange), but
    * once it IS paid, the marginal cost of more partitions is per-task
    * overhead (~10 ms each), not bytes — so tasks are sized at ~1/8 of
    * the gate quantum (~0.1 s of kernel work each). Measured: sizing
    * ns68's CMS build at full 64 MB quanta gave 4 tasks carrying 14
    * task-seconds of explode+hash — 1.5 s wall on a 32-core session;
    * the same exchange at 32 tasks runs it in ~0.45 s.
    */
  val TaskWorkBytes: Long = MinWorkBytes / 8

  /** Where the frame's physical layout comes from: the layout-determining
    * SPINE of the plan — root → unary child → the STREAMED side of a
    * broadcast join — terminating at either a shuffle exchange (the frame
    * arrives at exchange width) or a leaf scan (the frame inherits the
    * scan's split count). Anything else (union, sort-merge join,
    * cartesian) is Unknown and left alone.
    */
  private sealed trait Layout
  private final case class FromExchange(e: ShuffleExchangeExec, coalescible: Boolean)
      extends Layout
  private final case class FromLeaf(leaf: SparkPlan) extends Layout
  private final case class FromCoalesce(width: Int) extends Layout
  private case object Unknown extends Layout

  @tailrec
  private def layoutOf(p: SparkPlan): Layout = p match {
    case e: ShuffleExchangeExec =>
      // AQE's byte-based coalescing applies only to exchanges it is
      // allowed to merge; a user repartition(n) (REPARTITION_BY_NUM)
      // keeps its width.
      val coalescible = e.shuffleOrigin match {
        case ENSURE_REQUIREMENTS | REPARTITION_BY_COL |
            REBALANCE_PARTITIONS_BY_NONE | REBALANCE_PARTITIONS_BY_COL => true
        case _ => false
      }
      FromExchange(e, coalescible)
    case r: ReusedExchangeExec => layoutOf(r.child)
    case c: CoalesceExec => FromCoalesce(c.numPartitions)
    case j: BroadcastHashJoinExec =>
      layoutOf(j.buildSide match {
        case BuildLeft => j.right
        case BuildRight => j.left
      })
    case j: BroadcastNestedLoopJoinExec =>
      layoutOf(j.buildSide match {
        case BuildLeft => j.right
        case BuildRight => j.left
      })
    case leaf if leaf.children.isEmpty => FromLeaf(leaf)
    case u if u.children.length == 1 => layoutOf(u.children.head)
    case _ => Unknown
  }

  /** `df`, repartitioned toward the session's shuffle parallelism when
    * its physical layout would hand the declared downstream work to
    * fewer tasks than the work justifies; unchanged otherwise.
    *
    * `fanout` is the caller's declared work amplification — estimated
    * CPU work per Catalyst-estimated input byte, in scan-equivalent
    * bytes (1.0 = the kernel costs about what scanning the bytes costs).
    * Call sites document the measurement their value comes from. The
    * work estimate is `optimizedPlan.stats.sizeInBytes * fanout`: plan
    * statistics and PHYSICAL PLANNING only, never an action — the gate
    * must not execute anything (the round-12 ADVICE finding: probing
    * `.rdd` under AQE materializes every upstream stage).
    *
    * Decision order:
    *
    *  1. Below [[MinWorkBytes]] of estimated work, single-task latency
    *     is cheaper than any exchange — skip (the ns67 fix, round 13).
    *  2. Otherwise size the width the WORK wants: one [[MinWorkBytes]]
    *     quantum per task, clamped to the session parallelism.
    *  3. Walk the layout spine of the prepared physical plan (pre-AQE:
    *     exchanges are explicit, nothing has run):
    *     - Arrives from a COALESCIBLE exchange: the exchange has session
    *       width on paper, but AQE's byte-based coalescing will merge it
    *       down to ~`bytes / advisoryPartitionSizeInBytes` partitions —
    *       a rule that cannot see per-byte kernel cost (ns225's 2 s
    *       Holt–Winters fold ran on numCoalescedPartitions=2 over
    *       2.2 MB; the measured 100×-scale dual is ns208's pre-fix
    *       10×-rows → 16×-wall flag). When the work-sized width exceeds
    *       that byte-sized estimate, add an explicit `repartition(n)` —
    *       REPARTITION_BY_NUM, which AQE never coalesces — paying one
    *       small exchange (the frame is post-aggregate small by the same
    *       estimate) to keep the kernel wide.
    *     - Arrives from a NON-coalescible exchange at ≥ the wanted
    *       width: already wide — untouched.
    *     - Scan-rooted (leaf, or an explicit coalesce): probe the leaf's
    *       split count — pure split planning on a leaf node, no job —
    *       and widen when it is below the wanted width (a broadcast
    *       join on the spine streams THROUGH to the scan: the round-13
    *       regression class).
    *     - Unknown spine (union, shuffled join): untouched.
    *
    * At production scale every branch resolves to a no-op: scans arrive
    * wide, and exchange bytes large enough to defeat AQE coalescing make
    * the byte-sized width ≥ the work-sized width.
    *
    * Ordering caveat: the added exchange is round-robin — callers that
    * need a carefully arranged sort order downstream of `spread` must
    * sort after it, not before.
    */
  def spread(df: DataFrame, fanout: Double): DataFrame = {
    require(fanout > 0, "fanout must be positive")
    val qe = df.queryExecution
    val conf = df.sparkSession.conf
    val sessionN = conf.get("spark.sql.shuffle.partitions").toInt
    val statsBytes = qe.optimizedPlan.stats.sizeInBytes
    val workBytes = statsBytes.toDouble * fanout
    if (workBytes < MinWorkBytes) return df
    val want = math.min(sessionN.toDouble, math.ceil(workBytes / TaskWorkBytes)).toInt
    if (want < 2) return df
    val phys = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    layoutOf(phys) match {
      case FromExchange(e, coalescible) =>
        // A non-coalescible exchange (user repartition — including an
        // upstream spread's own REPARTITION_BY_NUM) was sized
        // deliberately and AQE will not shrink it: trust it, never
        // stack a second exchange on top. Only a COALESCIBLE exchange
        // needs out-voting, and only when AQE coalescing is on.
        if (!coalescible || !aqeCoalesceOn(conf)) df
        else {
          // AQE coalesces by the EXCHANGE's shuffle bytes, not the
          // plan's final output bytes — a root aggregate can shrink
          // output far below what crosses the wire, so a root-stats
          // estimate undershoots the width AQE actually keeps and
          // stacks a redundant exchange on an already-wide read.
          // Estimate from the exchange child's own logical stats;
          // absent a logical link, fall back to the root stats (the
          // smaller number — fails toward repartitioning, the
          // pre-round-15 behavior).
          val exBytes = e.child.logicalLink
            .map(_.stats.sizeInBytes).getOrElse(statsBytes)
          val effective = math.min(
            e.outputPartitioning.numPartitions.toLong,
            byteSizedWidth(conf, exBytes)).toInt
          if (want > effective) df.repartition(want) else df
        }
      case FromCoalesce(width) =>
        if (width < want) df.repartition(want) else df
      case FromLeaf(leaf) =>
        // Probe ONLY provably inert leaves. A bare scan's execute() is
        // split planning — no job. But executeQuery PREPARES AND WAITS
        // ON runtime subqueries first: a scan carrying dynamic
        // partition pruning (DynamicPruningExpression/InSubqueryExec)
        // would run a real broadcast+subquery job at gate time — the
        // round-12 silent-double-execution class, and a SUCCESSFUL
        // subquery run never throws, so the NonFatal fallback cannot
        // see it. Such scans are left alone (at the scales DPP fires
        // on, the pruned scan arrives wide anyway).
        val inert = leaf.subqueries.isEmpty &&
          !leaf.expressions.exists(_.exists(_.isInstanceOf[ExecSubqueryExpression]))
        if (!inert) df
        else {
          val cur =
            try leaf.execute().getNumPartitions
            catch { case NonFatal(_) => Int.MaxValue }
          if (cur < want) df.repartition(want) else df
        }
      case Unknown => df
    }
  }

  private def aqeCoalesceOn(conf: org.apache.spark.sql.RuntimeConfig): Boolean =
    conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
      conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean

  /** AQE's byte-based estimate of how many partitions a coalescible
    * exchange read collapses to: `ceil(bytes / advisoryPartitionSize)`,
    * at least 1. Uses the same plan-stats bytes as the work estimate, so
    * a stats overestimate fails CONSERVATIVE (assumes AQE keeps more
    * width than it will, skips the repartition).
    */
  private def byteSizedWidth(
      conf: org.apache.spark.sql.RuntimeConfig, statsBytes: BigInt): Long = {
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    ((statsBytes + advisory - 1) / advisory).max(BigInt(1))
      .min(BigInt(Int.MaxValue)).toLong
  }
}
