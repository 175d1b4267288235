package graft.operators

import graft.Q
import graft.functions.Num.{dsum, fin}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational query surface (SURVEY §2.1).
  *
  * The reference's query engine is the CSR join graph + aggregations
  * (csr2transmart observation stats); re-expressed here as declarative
  * DataFrame plans over the star schema so Catalyst gets full pushdown,
  * broadcast selection and AQE. All money aggregates go through
  * [[graft.functions.Num.dsum]] for order-independent (oracle-stable) sums.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan + filter + hash aggregate. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    // r14 (opt): single-row-group input → serial decimal aggregation;
    // gated spread 1.47 → 0.60 s at sf0.1 (Tables.spread doc)
    t.spread("lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fin(dsum(col("l_quantity"))).as("sum_qty"),
        fin(dsum(col("l_extendedprice"))).as("sum_base_price"),
        fin(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        fin(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        round(dsum(col("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(dsum(col("l_discount")).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_charge,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped: broadcast dim filter + 3-way join + top-k. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val cut = lit("1998-06-01").cast("timestamp")
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders.filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t.lineitem.filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(fin(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped: 5-way star join with broadcast dims. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val dims = t.nation
      .join(t.region.filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(t.orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(fin(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Window rank: the reference's latest/primary-record-per-entity idiom. */
  def topCustomerPerNation(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer.join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  private val topCustomerSql =
    """SELECT n_name, c_custkey, c_name, c_acctbal FROM (
      |  SELECT n_name, c_custkey, c_name, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey) x
      |WHERE rn = 1 ORDER BY n_name""".stripMargin

  /** Window running sum (exact decimal accumulation for oracle parity). */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    // the synthetic data repeats (l_orderkey, l_linenumber) across chunks,
    // so the ordering must include the measure itself to stay deterministic
    // when a full (shipdate, orderkey, linenumber) tie occurs
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.lineitem
      .withColumn("running_revenue", fin(sum(col("l_extendedprice").cast(DecimalType(28, 6))).over(w)))
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("running_revenue"))
  }

  private val runningRevenueSql =
    """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_revenue
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, running_revenue""".stripMargin

  /** Referential integrity: orphans on both sides of orders↔lineitem
    * (the reference validates diagnosis→individual etc. the same way). */
  def orphanCheck(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val ordersNoItems = t.orders.join(t.lineitem.select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(lit("order_without_lineitem").as("kind"), col("o_orderkey").as("key"))
    val itemsNoOrder = t.lineitem.select("l_orderkey").distinct()
      .join(t.orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .select(lit("lineitem_without_order").as("kind"), col("l_orderkey").as("key"))
    ordersNoItems.unionAll(itemsNoOrder)
  }

  private val orphanSql =
    """SELECT 'order_without_lineitem' AS kind, o_orderkey AS key FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |UNION ALL
      |SELECT 'lineitem_without_order' AS kind, l_orderkey AS key
      |FROM (SELECT DISTINCT l_orderkey FROM lineitem) li
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |ORDER BY kind, key""".stripMargin

  /** Hierarchy rollup with tranSMART-style concept paths
    * (reference: ontology_config tree node counts). */
  def treeRollup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val joined = t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
    val regionLevel = joined.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), fin(dsum(col("c_acctbal"))).as("total_acctbal"))
      .select(concat(lit("\\"), col("r_name"), lit("\\")).as("path"), col("n_customers"), col("total_acctbal"))
    val nationLevel = joined.groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), fin(dsum(col("c_acctbal"))).as("total_acctbal"))
      .select(concat(lit("\\"), col("r_name"), lit("\\"), col("n_name"), lit("\\")).as("path"),
        col("n_customers"), col("total_acctbal"))
    regionLevel.unionAll(nationLevel)
  }

  private val treeRollupSql =
    """WITH j AS (
      |  SELECT r_name, n_name, c_acctbal FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT '\' || r_name || '\' AS path, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_acctbal
      |FROM j GROUP BY r_name
      |UNION ALL
      |SELECT '\' || r_name || '\' || n_name || '\' AS path, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_acctbal
      |FROM j GROUP BY r_name, n_name
      |ORDER BY path""".stripMargin

  /** Distinct / count-distinct (entity key dedup accounting). */
  def distinctCustomers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    t.orders.agg(
      countDistinct(col("o_custkey")).as("n_customers_with_orders"),
      count(lit(1)).as("n_orders"),
      countDistinct(col("o_orderpriority")).as("n_priorities"))
  }

  private val distinctSql =
    """SELECT COUNT(DISTINCT o_custkey) AS n_customers_with_orders,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities
      |FROM orders""".stripMargin

  /** TPC-H Q17-shaped correlated aggregate: revenue from lineitems whose
    * quantity is below half their part's average quantity.
    *
    * One pass, no self-join: the per-part average is a whole-partition
    * window (`sum`/`count` over PARTITION BY l_partkey), so lineitem is
    * shuffled ONCE on l_partkey instead of twice (agg + fact join). The
    * threshold compare is done multiplied through (`qty * 2 * cnt <
    * sum_qty`) in decimal — no division, so no engine-specific decimal
    * quotient scale and no double rounding at the boundary. Brand lookup
    * is a broadcast of `part`. At 100 TB: one exchange on a high-card key
    * (no skew — parts are uniform), window needs no ORDER BY sort beyond
    * the exchange's local clustering. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val w = Window.partitionBy(col("l_partkey"))
    val dec = DecimalType(28, 6)
    t.lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .withColumn("sum_qty_part", sum(col("l_quantity").cast(dec)).over(w))
      .withColumn("cnt_part", count(lit(1)).over(w))
      .where(col("l_quantity").cast(dec) * lit(2) * col("cnt_part") < col("sum_qty_part"))
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(fin(dsum(col("l_extendedprice"))).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  private val smallQtySql =
    """WITH lw AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice,
      |    SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (PARTITION BY l_partkey) AS sum_qty_part,
      |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt_part
      |  FROM lineitem)
      |SELECT p_brand,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS small_qty_revenue,
      |  COUNT(*) AS n_items
      |FROM lw JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_quantity AS DECIMAL(28,6)) * 2 * cnt_part < sum_qty_part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** TPC-H Q18-shaped: orders whose total quantity exceeds a threshold,
    * with the buying customer. The HAVING filter runs on the aggregate
    * BEFORE any join, so the join input collapses from |orders| to the
    * handful of whale orders — AQE then picks a broadcast join at runtime
    * for both the orders and customer sides. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(fin(dsum(col("l_quantity"))).as("sum_qty"))
      .where(col("sum_qty") > 250)
    big
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  private val largeOrdersSql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM (SELECT l_orderkey,
      |        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey) b
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE sum_qty > 250
      |ORDER BY o_orderkey""".stripMargin

  /** TPC-H Q8-shaped market share: per order year, the fraction of EUROPE
    * customers' revenue supplied by NATION_3. Dims (supplier, customer,
    * nation, region) all broadcast; lineitem⋈orders is the one big
    * shuffle. The share is a conditional aggregate over exact decimal
    * sums, divided once per year at the end. */
  def mktShare(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val euroNations = t.nation
      .join(broadcast(t.region.where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val euroCust = t.customer
      .join(broadcast(euroNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = t.supplier
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val dec = DecimalType(28, 6)
    t.lineitem
      .join(t.orders.join(broadcast(euroCust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("order_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec).as("rev"),
        col("supp_nation"))
      .groupBy(col("order_year"))
      .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("rev")).otherwise(lit(0).cast(dec)))
            .cast("double")
          / sum(col("rev")).cast("double"), 6).as("mkt_share"),
        fin(dsum(col("rev"))).as("total_revenue"))
  }

  private val mktShareSql =
    """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
      |  ROUND(
      |    CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
      |             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
      |             ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE),
      |    6) AS mkt_share,
      |  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |GROUP BY YEAR(o_orderdate)
      |ORDER BY order_year""".stripMargin

  /** TPC-H Q22-shaped: per nation, customers richer than the global
    * positive-balance average who never ordered. The global average is a
    * single-row aggregate broadcast to every partition; the "above
    * average" test is multiplied through (`bal · n > sum`) in decimal so
    * no quotient rounding can flip a boundary row in either engine. The
    * never-ordered-urgent test is a LEFT ANTI join — at 100 TB this is the
    * shuffle pair (customer ⋈ orders) with the anti side pre-filtered at
    * the scan (pushed predicate) and reduced to o_custkey only. */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val dec = DecimalType(28, 6)
    val stats = t.customer.where(col("c_acctbal") > 0)
      .agg(dsum(col("c_acctbal")).as("sum_pos"), count(lit(1)).as("n_pos"))
    t.customer
      .crossJoin(broadcast(stats))
      .where(col("c_acctbal").cast(dec) * col("n_pos") > col("sum_pos"))
      .join(t.orders.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        fin(dsum(col("c_acctbal"))).as("total_acctbal"))
  }

  private val idleRichSql =
    """WITH s AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS sum_pos, COUNT(*) AS n_pos
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer
      |CROSS JOIN s
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE CAST(c_acctbal AS DECIMAL(28,6)) * n_pos > sum_pos
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** TPC-H Q15-shaped: the top-revenue supplier(s) over a quarter — the
    * max-of-an-aggregate shape, ties kept. The per-supplier revenue table
    * is |suppliers| rows; its single-row max broadcasts back over it, so
    * the only corpus-sized work is the first aggregation (filter pushed to
    * the scan). Comparing the ROUNDED revenue keeps the tie test exact in
    * both engines. */
  def topRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val rev = t.lineitem
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(fin(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .where(col("total_revenue") === col("max_rev"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  private val topRevenueSupplierSql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21-shaped: suppliers who were the SOLE late shipper on
    * multi-supplier orders ("late" = shipped > 90 days after the order
    * date). One lineitem⋈orders shuffle produces per-line lateness; the
    * per-order supplier counts are a second aggregation over that same
    * partitioning (exchange reuse on l_orderkey); the final rollup groups
    * by the handful of qualifying suppliers. */
  def soloLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    // cascade of narrowing aggregates instead of COUNT(DISTINCT …) pairs:
    // per-(order, supplier) lateness first (no Expand in the plan), then
    // per-order counts over that already-collapsed set — and the sole late
    // supplier is read straight out of the per-supplier level, so the raw
    // join output is never revisited
    // r15 (opt): Tables.spread on the join probe front was built and
    // A/B-REJECTED (1.74->1.77, 1.45->1.89 s) — the broadcast probe +
    // partial agg is cheaper than the round-robin exchange it saves
    val perSupp = t.lineitem
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("supp_late"))
    // r15 (opt): a single-pass WINDOW qualification (count/late-sum over
    // l_orderkey partitions replacing the qual aggregate + join, so the
    // duplicated lineitem⋈orders subtree runs once) was built, oracle-
    // verified, and REJECTED on measurement: sf1 adjacent A/B read
    // NEUTRAL at 32 cores (norm. 1.90 vs 1.71 against the q1 control) and
    // at 8 cores (1.37 vs 1.34) — the window's 6M-row sort costs what the
    // duplicate hash-agg subtree costs, and the two subtrees overlap on
    // spare cores (the events_mad_outliers persist lesson).
    val qual = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1L).otherwise(0L)).as("n_late_supp"))
      .where(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("qo"))
    perSupp.where(col("supp_late"))
      .join(qual, col("l_orderkey") === col("qo"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  private val soloLateSql =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |qual AS (
      |  SELECT l_orderkey FROM li
      |  GROUP BY l_orderkey
      |  HAVING COUNT(DISTINCT l_suppkey) >= 2
      |     AND COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
      |SELECT s_name, COUNT(DISTINCT li.l_orderkey) AS numwait
      |FROM li
      |JOIN qual ON li.l_orderkey = qual.l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE late
      |GROUP BY s_name
      |ORDER BY s_name""".stripMargin

  /** NTILE decile profile of order value WITHIN each priority class. The
    * window partitions by priority — a global decile would demand a
    * full-corpus total order (one reducer); per-group deciles keep the
    * sort inside each partition's exchange, and the cross-engine contract
    * is NTILE's positional definition (identical in Spark and DuckDB)
    * over a made-unique ordering (totalprice, orderkey). */
  def orderDeciles(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(dir).orders
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo_value"),
        max(col("o_totalprice")).as("hi_value"),
        fin(dsum(col("o_totalprice"))).as("total_value"))
  }

  private val orderDecilesSql =
    """WITH d AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    NTILE(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT o_orderpriority, CAST(decile AS BIGINT) AS decile,
      |  COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS lo_value, MAX(o_totalprice) AS hi_value,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS total_value
      |FROM d
      |GROUP BY o_orderpriority, decile
      |ORDER BY o_orderpriority, decile""".stripMargin

  /** Relational set difference: customers who ever ordered URGENT but
    * never LOW — the EXCEPT (distinct) operator, planned by Spark as a
    * left-anti over pre-distincted sides (both sides collapse BEFORE the
    * anti join; nothing corpus-sized crosses the exchange). */
  def urgentOnlyCustomers(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val t = Tables(dir)
    def side(p: String) = t.orders.where(col("o_orderpriority") === p)
      .select(col("o_custkey"))
    side("1-URGENT").except(side("5-LOW")).select(col("o_custkey").as("custkey"))
  }

  private val urgentOnlySql =
    """SELECT custkey FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
      |ORDER BY custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> Q(q1PricingSummary _, q1Sql, Seq(col("l_returnflag"), col("l_linestatus"))),
    "q3_shipping_priority" -> Q(q3ShippingPriority _, q3Sql, Seq(col("revenue").desc, col("l_orderkey"))),
    "q5_local_supplier" -> Q(q5LocalSupplier _, q5Sql, Seq(col("revenue").desc, col("n_name"))),
    "q_top_customer_per_nation" -> Q(topCustomerPerNation _, topCustomerSql, Seq(col("n_name"))),
    "q_running_revenue" -> Q(runningRevenue _, runningRevenueSql,
      Seq(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("running_revenue"))),
    "q_orphan_check" -> Q(orphanCheck _, orphanSql, Seq(col("kind"), col("key"))),
    "q_tree_rollup" -> Q(treeRollup _, treeRollupSql, Seq(col("path"))),
    "q_distinct_customers" -> Q(distinctCustomers _, distinctSql),
    "q_small_qty_revenue" -> Q(smallQtyRevenue _, smallQtySql, Seq(col("p_brand"))),
    "q_large_orders" -> Q(largeOrders _, largeOrdersSql, Seq(col("o_orderkey"))),
    "q_mkt_share" -> Q(mktShare _, mktShareSql, Seq(col("order_year"))),
    "q_idle_rich_customers" -> Q(idleRichCustomers _, idleRichSql, Seq(col("n_name"))),
    "q_top_revenue_supplier" -> Q(topRevenueSupplier _, topRevenueSupplierSql, Seq(col("s_suppkey"))),
    "q_solo_late_supplier" -> Q(soloLateSupplier _, soloLateSql, Seq(col("s_name"))),
    "q_order_deciles" -> Q(orderDeciles _, orderDecilesSql, Seq(col("o_orderpriority"), col("decile"))),
    "q_urgent_only_customers" -> Q(urgentOnlyCustomers _, urgentOnlySql, Seq(col("custkey"))),
  )
}
