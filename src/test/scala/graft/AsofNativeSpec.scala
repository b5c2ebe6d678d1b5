package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** The native as-of join SparkPlan: semantics vs the composed form, the
  * self-source (shared expression id) case, plan shape, and partitioning
  * invariance.
  */
class AsofNativeSpec extends SparkSpec {

  import spark.implicits._

  test("backwardNative matches hand goldens incl. no-match and null handling") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 4L, "r4"), (1L, 10L, "r10"), (2L, 8L, "r8"))
      .toDF("k", "rt", "payload")
    val got = AsofJoin.backwardNative(left, right, Seq("k"), "t", "rt")
      .collect().map(r => r.getString(2) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.getString(5)))).toMap
    assert(got("a") == ((Some(10L), Some("r10"))), s"equal-ts must match: ${got("a")}")
    assert(got("b") == ((Some(4L), Some("r4"))))
    assert(got("c") == ((None, None)), "rt=8 > t=7 must NOT match backward")
    assert(got("d") == ((None, None)), "key with no right rows")
  }

  test("backwardNative equals the composed backward + payload rejoin on the fixture") {
    val ev = Tables(spark, sfDir, "events")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
    // dedupe right (key, ts) pairs — the documented tie contract
    val r = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("ru"), unix_micros(col("ts")).as("rt"))
      .agg(max("event_id").as("r_event"))
    val native = AsofJoin.backwardNative(
        l, r.withColumnRenamed("ru", "user_id"), Seq("user_id"), "t", "rt")
      .select(col("event_id"), col("rt"), col("r_event"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    // independent spelling: per-left-row max(rt ≤ t) via join+groupBy,
    // payload rejoined on (key, matched ts)
    val r2 = r.select(col("ru").as("ru2"), col("rt").as("m_rt"), col("r_event"))
    val comp2 = l
      .join(r, col("user_id") === col("ru") && col("rt") <= col("t"), "left_outer")
      .groupBy("event_id", "user_id", "t")
      .agg(max("rt").as("asof_rt"))
      .join(r2, col("user_id") === col("ru2") && col("asof_rt") === col("m_rt"), "left_outer")
      .select(col("event_id"), col("asof_rt"), col("r_event"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(native == comp2,
      s"native drifted: extra=${(native -- comp2).take(3)}, missing=${(comp2 -- native).take(3)}")
  }

  test("native as-of handles both sides from the SAME source (shared expr ids)") {
    val ev = Tables(spark, sfDir, "events").limit(500)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
    val out = AsofJoin.backwardNative(ev, ev, Seq("user_id"), "t", "t")
    // every row matches itself (equal timestamps match backward)
    assert(out.count() == 500)
    assert(out.columns.length == 6, s"both sides' columns present: ${out.columns.toSeq}")
  }

  test("forwardNative is backward under negation: earliest rt >= t, else nulls") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 9L, "c")).toDF("k", "t", "tag")
    val right = Seq((1L, 7L, "r7"), (1L, 12L, "r12"), (2L, 8L, "r8")).toDF("k", "rt", "p")
    val got = AsofJoin.forwardNative(left, right, Seq("k"), "t", "rt")
      .collect().map(r => r.getString(2) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]), Option(r.getString(5)))).toMap
    assert(got("a") == ((Some(12L), Some("r12"))), s"got ${got("a")}")
    assert(got("b") == ((Some(7L), Some("r7"))))
    assert(got("c") == ((None, None)), "rt=8 < t=9 must NOT match forward")
  }

  test("plan shape: AsofJoinBackwardExec with one exchange+sort per side; partition-invariant") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k", "rt")
    val df = AsofJoin.backwardNative(l.repartition(7), r.repartition(3), Seq("k"), "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoinBackward"), plan) // nodeName strips the Exec suffix
    assert(df.collect().length == 1)
    // bigger shuffle-partition stress: results must not depend on layout
    val left = (1L to 1000L).map(i => (i % 13, i)).toDF("k", "t")
    val right = (1L to 300L).map(i => (i % 13, i * 3)).toDF("k", "rt")
    val a = AsofJoin.backwardNative(left, right, Seq("k"), "t", "rt")
      .collect().map(_.toString).sorted.toSeq
    val b = AsofJoin.backwardNative(left.repartition(17), right.coalesce(1), Seq("k"), "t", "rt")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "native as-of depends on input partitioning")
  }
}
