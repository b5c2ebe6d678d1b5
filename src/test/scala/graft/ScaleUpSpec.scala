package graft

import java.util.UUID

import org.apache.spark.sql.functions._

/** The derived benchmark dataset must preserve the SHAPES the scale-up
  * screen measures: per-key join fan-out (10x groups, never 10x-deep
  * groups), key uniqueness, fixed dims, and non-duplicate document text.
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  test("ScaleUp scales facts by the replica count, preserves fan-out and key uniqueness") {
    val dst = s"${System.getProperty("java.io.tmpdir")}/graft-scaleup-${UUID.randomUUID().toString.take(8)}"
    val r = 3
    assert(ScaleUp.ensure(spark, sfDir, dst, replicas = r))
    def base(n: String) = Tables(spark, sfDir, n)
    def up(n: String) = Tables(spark, dst, n)
    // facts replicate, dims stay fixed
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events", "documents"))
      assert(up(t).count() == r * base(t).count(), s"$t row count")
    for (t <- Seq("region", "nation"))
      assert(up(t).count() == base(t).count(), s"$t must stay fixed")
    // shifted primary keys stay unique
    assert(up("customer").select("c_custkey").distinct().count() == up("customer").count())
    assert(up("orders").select("o_orderkey").distinct().count() == up("orders").count())
    // per-key join fan-out is IDENTICAL: the orders-lineitem join scales
    // by exactly r because FKs shift by the same base as their PKs
    def joinCount(o: String => org.apache.spark.sql.DataFrame) =
      o("orders").join(o("lineitem"), col("o_orderkey") === col("l_orderkey")).count()
    assert(joinCount(up) == r * joinCount(base), "join fan-out drifted")
    // per-user event counts are preserved (user ids shift per replica)
    val baseMax = base("events").groupBy("user_id").count().agg(max("count")).head().getLong(0)
    val upMax = up("events").groupBy("user_id").count().agg(max("count")).head().getLong(0)
    assert(upMax == baseMax, "per-user event depth changed")
    // document text is NOT duplicated ACROSS replicas (similarity
    // honesty): the fixture's seeded within-replica duplicates persist,
    // so distinct texts scale exactly by r
    assert(up("documents").select("text").distinct().count() ==
      r * base("documents").select("text").distinct().count())
    // idempotent: the marker short-circuits a rebuild
    assert(ScaleUp.ensure(spark, sfDir, dst, replicas = r))
  }
}
