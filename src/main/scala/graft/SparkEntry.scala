package graft

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.engine.Engine
import graft.pipeline.Ingest
import graft.sinks.{ManagedWriter, StreamType}
import graft.sources.{ParquetTableSource, ScanOptions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query-naming convention maps to SURVEY §2:
  *   - `aNN_*` → §2.A layer-A pipeline operators (A1-A21)
  *   - `bNN_*` → §2.B relational surface rows (Catalyst built-ins, per the
  *     survey's "no custom code" verdict — these entries demonstrate and
  *     regression-pin the delegated capability)
  *   - `ns_*`  → north-star LLM-pipeline extensions (dedup / similarity /
  *     text analysis / streaming)
  *
  * Oracle-parity rules used throughout (driver hashes values with columns
  * sorted by name; DuckDB is the oracle):
  *   - NO DECIMAL in any output schema. The driver's comparison materializes
  *     DuckDB results as float64 while Spark parquet decimals stay Decimal —
  *     every round-1 hash mismatch was exactly the queries with decimal
  *     output columns. Decimal stays an *internal* exact-arithmetic device.
  *   - Sums over doubles go through DECIMAL(10,2) so addition is exact and
  *     order-independent, then a single CAST(.. AS DOUBLE): the exact sum's
  *     unscaled value stays < 2^53 at verify scale, so both engines perform
  *     one identical correctly-rounded IEEE division by 10^scale.
  *   - Averages = CAST(decimal-sum AS DOUBLE)/COUNT — one IEEE division of
  *     identical operands, bit-deterministic in both engines.
  *   - Functions whose return type differs across engines (length, year,
  *     floor, row_number, ...) are cast to a common type on BOTH sides.
  *   - Every query carries a total ORDER BY over a unique key set.
  */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact-arithmetic cast for money/quantity doubles. */
  private def dec(c: Column): Column = c.cast(DecimalType(10, 2))

  /** Order-independent exact sum, emitted as DOUBLE (never decimal — see
    * oracle-parity rules above).
    */
  private def fsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average (see oracle-parity rules above). */
  private def favg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Oracle-side twins of dec/fsum/favg. */
  private def oDec(x: String) = s"CAST($x AS DECIMAL(10,2))"
  private def oSum(x: String) = s"CAST(SUM(${oDec(x)}) AS DOUBLE)"
  private def oAvg(x: String) = s"CAST(SUM(${oDec(x)}) AS DOUBLE) / COUNT(*)"

  private final case class Q(
      name: String,
      oracle: Option[String])(val run: (SparkSession, String) => DataFrame)

  // ------------------------------------------------------- layer A (pipeline)

  private val layerA: Seq[Q] = Seq(
    // A1: the flagship source→table pipeline (≈ BQ2Duck, bigquack.go:64-141).
    Q(
      "a01_pipeline_ingest",
      Some("SELECT * FROM supplier ORDER BY s_suppkey")) { (s, dir) =>
      val eng = new Engine(s)
      val dest = s"pipe_${UUID.randomUUID().toString.replace("-", "")}"
      Ingest.run(eng, new ParquetTableSource(dir), "supplier", dest)
      s.table(dest).orderBy("s_suppkey")
    },
    // A2+A6+A7+A8: partitioned scan with column-prune + predicate pushdown
    // (≈ bigquack_test.go:12-30 adapted to the fixture's column subset).
    Q(
      "a07_scan_pushdown",
      Some(
        "SELECT s_suppkey, s_name, s_acctbal FROM supplier " +
          "WHERE s_suppkey > 0 ORDER BY s_suppkey")) { (s, dir) =>
      new ParquetTableSource(dir)
        .read(
          s,
          "supplier",
          ScanOptions(
            selectedFields = Seq("s_suppkey", "s_name", "s_acctbal"),
            rowRestriction = Some("s_suppkey > 0"),
            maxStreamCount = Some(2)))
        .orderBy("s_suppkey")
    },
    // A12+A14-A16: create-then-append through the managed writer, pending
    // stream semantics (≈ duck_test.go:158-189 create+append ⇒ doubled rows).
    Q(
      "a12_ingest_create_append",
      Some(
        "SELECT * FROM (SELECT * FROM supplier UNION ALL SELECT * FROM supplier) " +
          "ORDER BY s_suppkey")) { (s, dir) =>
      val supplier = T(s, dir, "supplier")
      val dest = s"${System.getProperty("java.io.tmpdir")}/graft-ingest-" +
        UUID.randomUUID().toString.take(8)
      val w = new ManagedWriter(s, dest, supplier.schema, StreamType.Pending)
      w.write(supplier) // create
      w.write(supplier) // append
      w.finalizeCommit()
      s.read.parquet(dest).orderBy("s_suppkey")
    }
  )

  // --------------------------------------------- layer B (relational parity)

  private val layerB: Seq[Q] = Seq(
    Q(
      "b01_projection",
      Some(
        "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey")) { (s, dir) =>
      T(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    },
    Q(
      "b02_filter",
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem " +
          "WHERE l_quantity < 25 AND l_discount > 0.02 " +
          "ORDER BY l_orderkey, l_linenumber")) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_quantity") < 25 && col("l_discount") > 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    },
    Q(
      "b03_sort_limit",
      Some(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")) { (s, dir) =>
      T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },
    // TPC-H Q1-shaped pricing summary (the reference's de-facto corpus is
    // TPC-H, bigquery_test.go:26).
    Q(
      "b04_agg_pricing_summary",
      Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  ${oSum("l_quantity")} AS sum_qty,
           |  ${oSum("l_extendedprice")} AS sum_base_price,
           |  CAST(SUM(${oDec("l_extendedprice")} * (1 - ${oDec("l_discount")})) AS DOUBLE) AS sum_disc_price,
           |  ${oAvg("l_quantity")} AS avg_qty,
           |  ${oAvg("l_extendedprice")} AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)) { (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          fsum(col("l_quantity")).as("sum_qty"),
          fsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double")
            .as("sum_disc_price"),
          favg(col("l_quantity")).as("avg_qty"),
          favg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Q(
      "b05_group_having",
      Some(
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders " +
          "GROUP BY o_orderpriority HAVING COUNT(*) > 100 " +
          "ORDER BY o_orderpriority")) { (s, dir) =>
      T(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 100)
        .orderBy("o_orderpriority")
    },
    Q(
      "b06_count_distinct",
      Some(
        "SELECT COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part, " +
          "COUNT(*) AS n_rows FROM lineitem")) { (s, dir) =>
      T(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    },
    // Dimension joins: both sides broadcast — no shuffle of the fact table.
    Q(
      "b07_join_broadcast",
      Some(
        s"""SELECT r_name, COUNT(*) AS n_cust, ${oSum("c_acctbal")} AS sum_bal
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin)) { (s, dir) =>
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val r = T(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"))
        .agg(count(lit(1)).as("n_cust"), fsum(c("c_acctbal")).as("sum_bal"))
        .orderBy("r_name")
    },
    // Fact-fact join: shuffle on the join key, partial aggregation after.
    Q(
      "b08_join_fact",
      Some(
        s"""SELECT o_orderpriority,
           |  COUNT(*) AS n_items,
           |  CAST(SUM(${oDec("l_extendedprice")} * (1 - ${oDec("l_discount")})) AS DOUBLE) AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) { (s, dir) =>
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(dec(li("l_extendedprice")) * (lit(1) - dec(li("l_discount"))))
            .cast("double")
            .as("revenue"))
        .orderBy("o_orderpriority")
    },
    Q(
      "b09_semi_join",
      Some(
        "SELECT c_nationkey, COUNT(*) AS n FROM customer " +
          "WHERE c_custkey IN (SELECT o_custkey FROM orders) " +
          "GROUP BY c_nationkey ORDER BY c_nationkey")) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_nationkey")
    },
    Q(
      "b10_anti_join",
      Some(
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
          "ORDER BY c_custkey")) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Q(
      "b11_outer_join",
      Some(
        """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    Q(
      "b12_window_rank",
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders) WHERE rn <= 3
          |ORDER BY o_custkey, rn""".stripMargin)) { (s, dir) =>
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    Q(
      "b13_window_running",
      Some(
        s"""SELECT l_suppkey, l_orderkey, l_linenumber,
           |  CAST(SUM(${oDec("l_quantity")}) OVER (
           |    PARTITION BY l_suppkey
           |    ORDER BY l_shipdate, l_orderkey, l_linenumber
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
           |FROM lineitem
           |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      val w = Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem")
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Q(
      "b14_rollup",
      Some(
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
           |  COUNT(*) AS n, ${oSum("l_quantity")} AS sum_qty
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY flag, status""".stripMargin)) { (s, dir) =>
      T(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), fsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"),
          col("sum_qty"))
        .orderBy("flag", "status")
    },
    Q(
      "b15_cube",
      Some(
        s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS prio,
           |  COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
           |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
           |ORDER BY status, prio""".stripMargin)) { (s, dir) =>
      T(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), fsum(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"),
          col("sum_price"))
        .orderBy("status", "prio")
    },
    Q(
      "b16_grouping_sets",
      Some(
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
           |  COUNT(*) AS n
           |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY flag, status""".stripMargin)) { (s, dir) =>
      T(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
          |  COUNT(*) AS n
          |FROM gs_lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY flag, status""".stripMargin)
    },
    Q(
      "b17_union",
      Some(
        "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k")) { (s, dir) =>
      T(s, dir, "customer")
        .select(col("c_nationkey").as("k"))
        .union(T(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy("k")
    },
    Q(
      "b18_intersect",
      Some(
        "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k")) { (s, dir) =>
      T(s, dir, "customer")
        .select(col("c_nationkey").as("k"))
        .intersect(T(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },
    Q(
      "b19_except",
      Some(
        "SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY k")) { (s, dir) =>
      T(s, dir, "customer")
        .select(col("c_nationkey").as("k"))
        .except(T(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k")
    },
    Q(
      "b20_distinct",
      Some(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus")) { (s, dir) =>
      T(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },
    Q(
      "b21_string_funcs",
      Some(
        """SELECT n_nationkey, upper(n_name) AS uname, lower(n_name) AS lname,
          |  substring(n_name, 1, 3) AS pre3, CAST(length(n_name) AS INT) AS len,
          |  concat(n_name, '_', CAST(n_nationkey AS VARCHAR)) AS tagged,
          |  regexp_replace(n_name, '[AEIOU]', '.', 'g') AS devowel,
          |  trim(concat('  ', n_name, '  ')) AS trimmed
          |FROM nation ORDER BY n_nationkey""".stripMargin)) { (s, dir) =>
      T(s, dir, "nation")
        .select(
          col("n_nationkey"),
          upper(col("n_name")).as("uname"),
          lower(col("n_name")).as("lname"),
          substring(col("n_name"), 1, 3).as("pre3"),
          length(col("n_name")).as("len"),
          concat(col("n_name"), lit("_"), col("n_nationkey").cast(StringType)).as("tagged"),
          regexp_replace(col("n_name"), "[AEIOU]", ".").as("devowel"),
          trim(concat(lit("  "), col("n_name"), lit("  "))).as("trimmed"))
        .orderBy("n_nationkey")
    },
    Q(
      "b22_date_funcs",
      Some(
        """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
          |  CAST(month(o_orderdate) AS INT) AS mo, CAST(day(o_orderdate) AS INT) AS dom,
          |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          |  CAST(o_orderdate AS DATE) AS d
          |FROM orders ORDER BY o_orderkey""".stripMargin)) { (s, dir) =>
      T(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          col("o_orderdate").cast("date").as("d"))
        .orderBy("o_orderkey")
    },
    Q(
      "b23_case_when",
      Some(
        s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
           |            WHEN o_totalprice < 150000 THEN 'mid'
           |            ELSE 'high' END AS band,
           |  COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
           |FROM orders GROUP BY 1 ORDER BY band""".stripMargin)) { (s, dir) =>
      T(s, dir, "orders")
        .withColumn(
          "band",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), fsum(col("o_totalprice")).as("sum_price"))
        .orderBy("band")
    },
    Q(
      "b24_subquery_in",
      Some(
        s"""SELECT o_orderstatus, COUNT(*) AS n, ${oSum("o_totalprice")} AS sum_price
           |FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)) { (s, dir) =>
      val o = T(s, dir, "orders")
      val rich = T(s, dir, "customer").filter(col("c_acctbal") > 9000).select("c_custkey")
      o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), fsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },
    Q(
      "b25_subquery_scalar",
      Some(
        s"""SELECT c_nationkey, COUNT(*) AS n_above FROM customer
           |WHERE c_acctbal > (SELECT ${oAvg("c_acctbal")} FROM customer)
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)) { (s, dir) =>
      val c = T(s, dir, "customer")
      val avgBal = c.agg(favg(col("c_acctbal")).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_above"))
        .orderBy("c_nationkey")
    },
    Q(
      "b26_exists_correlated",
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)) { (s, dir) =>
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(
          o,
          c("c_custkey") === o("o_custkey") && o("o_totalprice") > 300000,
          "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Q(
      "b27_cte",
      Some(
        """WITH busy AS (
          |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
          |)
          |SELECT c_nationkey, COUNT(*) AS n_busy FROM customer
          |JOIN busy ON c_custkey = o_custkey
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)) { (s, dir) =>
      val busy = T(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 5)
      val c = T(s, dir, "customer")
      c.join(busy, c("c_custkey") === busy("o_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_busy"))
        .orderBy("c_nationkey")
    },
    Q(
      "b28_math_funcs",
      Some(
        """SELECT l_orderkey, l_linenumber, sqrt(l_extendedprice) AS sq,
          |  CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
          |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
          |  l_orderkey % 7 AS m7, abs(l_discount - 0.05) AS adev
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)) { (s, dir) =>
      T(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          sqrt(col("l_extendedprice")).as("sq"),
          floor(col("l_discount") * 100).as("disc_pct"),
          ceil(col("l_quantity")).as("qty_ceil"),
          (col("l_orderkey") % 7).as("m7"),
          abs(col("l_discount") - 0.05).as("adev"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Q(
      "b29_limit_offset",
      Some(
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 10")) { (s, dir) =>
      T(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(20)
    }
  )

  // ------------------------------------------------------------- assembly

  private def registry: Seq[Q] = layerA ++ layerB

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "b04_agg_pricing_summary").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
