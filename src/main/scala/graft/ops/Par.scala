package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.PlanExpression
import org.apache.spark.sql.catalyst.plans.logical._

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
  * [[spread]] widens such a frame to the session's shuffle parallelism —
  * but ONLY when the exchange it adds is worth buying. Round 12 shipped
  * an ungated spread and the driver bench confirmed the cost side: the
  * sf0.1 PNG-decode gate (ns67) regressed 0.825 → 1.852 s because the
  * added exchange (blob-column shuffle write + a re-executed exchange
  * subtree under the downstream sort) exceeded the half-second of decode
  * it parallelized. The gate below prices that trade explicitly.
  */
object Par {

  /** Work-equivalent bytes a single task should own before a widening
    * exchange pays for itself. Calibrated from the round-12 forensics:
    * the sf0.1 exchange + re-execution overhead the spread adds is
    * ~0.2–1 s wall-clock, so the single-task latency it removes must be
    * at least that — about 64 MB of scan-equivalent work at the ~60–100
    * MB/s effective throughput the fan-out kernels sustain per core.
    */
  val MinWorkBytes: Long = 64L << 20

  /** `df`, repartitioned to `spark.sql.shuffle.partitions` when (a) it is
    * a narrow scan-rooted pipeline, (b) its estimated downstream work
    * clears [[MinWorkBytes]], and (c) its physical layout is narrower
    * than the session parallelism; unchanged otherwise.
    *
    * `fanout` is the caller's declared work amplification — estimated
    * CPU work per Catalyst-estimated input byte, in scan-equivalent
    * bytes (1.0 = the kernel costs about what scanning the bytes costs).
    * Call sites document the measurement their value comes from. The
    * work estimate is `optimizedPlan.stats.sizeInBytes * fanout`: plan
    * statistics, never an action — the gate must not execute anything.
    *
    * Decision order, each step chosen for what it must NOT cost:
    *
    *  1. A plan that already contains a shuffle-inducing node (join,
    *     aggregate, sort, window, dedup, repartition, global limit, or a
    *     subquery) arrives at shuffle width on its own — and probing
    *     `.rdd` on such a plan under AQE MATERIALIZES every upstream
    *     stage just to read a partition count, then throws the result
    *     away (the round-12 ADVICE finding: silent double execution).
    *     Skip without touching the physical plan.
    *  2. Below [[MinWorkBytes]] of estimated work, single-task latency
    *     is cheaper than the exchange — skip (the ns67 fix).
    *  3. Only then probe the physical width. The plan is exchange-free
    *     by step 1, so `toRdd.getNumPartitions` is pure split planning —
    *     no job, no AQE stage materialization. At production scale the
    *     scan arrives wide and this resolves to a no-op here.
    */
  def spread(df: DataFrame, fanout: Double): DataFrame = {
    require(fanout > 0, "fanout must be positive")
    val qe = df.queryExecution
    val arrivesWide = qe.optimizedPlan.exists {
      // coalesce (Repartition with shuffle=false) NARROWS — keep gating;
      // any shuffle-bearing ancestor of it still matches on its own node.
      case r: Repartition => r.shuffle
      case _: Join | _: Aggregate | _: Sort | _: Window | _: Distinct |
          _: Deduplicate | _: RepartitionByExpression | _: GlobalLimit => true
      case p =>
        p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]]))
    }
    if (arrivesWide) df
    else if (qe.optimizedPlan.stats.sizeInBytes.toDouble * fanout < MinWorkBytes) df
    else {
      val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      if (qe.toRdd.getNumPartitions < n) df.repartition(n) else df
    }
  }
}
