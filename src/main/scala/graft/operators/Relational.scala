package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Portable._

/** Batch relational core (SURVEY.md §2.3 projections/filters, §2.4
  * aggregations, §2.5 joins). Each public op is a reusable library
  * function; `queries`/`oracle` bind them to the driver's correctness
  * gate. Reference behaviors covered: keyed running sum
  * (`wordcount/WordCount.java:55-57` → q01 grouped agg), predicate
  * filter + projection (`topn/HotItems.java:66-73` → q02), windowed
  * top-N (`topn/HotItems.java:80-147` → q03), keyed max-by
  * (`windowing/CustomizeEvictorAndTrigger.java:61` → q04), broadcast
  * dimension join (`connect/BroadcastDimension.java:92-126`,
  * `distributedcache/DistributedCacheExample.java:35-56` → q05),
  * union (`wordcount/WordCount.java:39` → q06), count-distinct window
  * (`flink-sql/sql/ddl/Time.md:16-18` → q08).
  */
object Relational extends graft.QueryModule {

  /** TPC-H Q1-style pricing summary: grouped exact-decimal sums +
    * derived ratios. Map-side partial aggregation + exchange on the
    * group keys is Spark's default plan; at 100 TB this is the optimal
    * shape (no row explosion, 2-col group key, decimal accumulators).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val disc  = lit(1).cast("decimal(18,2)") - dec(col("l_discount"))
    val price = dec(col("l_extendedprice"))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).as("qd"),
        sum(price).as("bd"),
        sum((price * disc).cast("decimal(28,4)")).as("dd"),
        count(lit(1)).as("count_order"))
      // raw double division of exact values: bit-identical in any
      // engine (unlike round(), whose half-way mode is engine-specific)
      .withColumn("avg_qty", col("qd").cast("double") / col("count_order"))
      // sums are exact decimals internally (order-free); emitted as
      // DOUBLE so both engines render the identical float64
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qd").cast("double").as("sum_qty"),
        col("bd").cast("double").as("sum_base_price"),
        col("dd").cast("double").as("sum_disc_price"),
        col("count_order"), col("avg_qty"))
  }

  /** Filter + computed projection; predicate and 4-column read schema
    * both push into the parquet scan. */
  def revenueItems(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("decimal(28,4)").cast("double").as("revenue"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag"))

  /** Top-N per group — the batch form of the reference's windowed
    * Top-N (`topn/HotItems.java:86-147`). The rank runs in the bounded
    * topK Aggregator (partial-aggregatable: every map task keeps ≤ n
    * candidates per flag) instead of a rank-over-window, which would
    * sort ALL groups inside as many partitions as there are flags —
    * the classic low-cardinality-partition skew at scale. The decimal
    * sums are exact in double here (2-dp quantities, totals ≪ 2^53),
    * so ordering by the double equals ordering by the decimal.
    */
  def topPartsByFlag(lineitem: DataFrame, n: Int): DataFrame =
    lineitem.groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("qty"))
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.Aggregators.topK(n)(
        col("qty"), col("l_partkey")).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")))
      .select(col("l_returnflag"), col("col.id").as("l_partkey"),
        col("col.sim").as("qty"), (col("pos") + 1).cast("int").as("rn"))

  /** Keyed max-by: keep the record with the max metric per key
    * (deterministic tie-break on highest key), via max(struct) so the
    * whole thing stays one hash aggregate — no window shuffle+sort.
    */
  def maxOrderPerStatus(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
      .select(
        col("o_orderstatus"),
        col("m.o_totalprice").as("top_price"),
        col("m.o_orderkey").as("top_orderkey"))

  /** Star-schema rollup: fact orders joined through customer to the
    * tiny nation/region dims. Dims are explicitly broadcast — at
    * 100 TB the fact side never shuffles for the dim joins; only the
    * final 5-group agg exchanges (partial agg first).
    */
  def revenueByRegion(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("total_revenue"),
        count(lit(1)).as("n_orders"))

  /** Union of two same-schema tagged streams (J8). */
  def taggedCounts(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag").as("k")).count()
      .withColumn("src", lit("lineitem_returnflag"))
      .unionByName(
        orders.groupBy(col("o_orderstatus").as("k")).count()
          .withColumn("src", lit("orders_status")))

  /** Left-semi join (EXISTS): segment counts of customers having at
    * least one big order. Semi-join keeps only the key column flowing
    * — no row multiplication.
    */
  def activeCustomerSegments(customer: DataFrame, orders: DataFrame,
                             minPrice: Double): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > minPrice),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** COUNT(DISTINCT) per group (A7): distinct customers + exact order
    * count per priority class. */
  def distinctCustomers(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))

  // ---- driver bindings -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) => pricingSummary(Tables.lineitem(s, d))),
    "q02_revenue_items"   -> ((s, d) => revenueItems(Tables.lineitem(s, d))),
    "q03_top_parts"       -> ((s, d) => topPartsByFlag(Tables.lineitem(s, d), 3)),
    "q04_max_order"       -> ((s, d) => maxOrderPerStatus(Tables.orders(s, d))),
    "q05_region_revenue"  -> ((s, d) => revenueByRegion(Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))),
    "q06_union_counts"    -> ((s, d) => taggedCounts(Tables.lineitem(s, d),
        Tables.orders(s, d))),
    "q07_semi_join"       -> ((s, d) => activeCustomerSegments(
        Tables.customer(s, d), Tables.orders(s, d), 400000.0)),
    "q08_count_distinct"  -> ((s, d) => distinctCustomers(Tables.orders(s, d)))
  )

  def oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
             count(*) AS count_order,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_items" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
             l_returnflag || '/' || l_linestatus AS flag
      FROM lineitem
      WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'""",
    "q03_top_parts" -> """
      SELECT l_returnflag, l_partkey, CAST(qty AS DOUBLE) AS qty, rn FROM (
        SELECT l_returnflag, l_partkey, qty,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY qty DESC, l_partkey ASC) AS rn
        FROM (SELECT l_returnflag, l_partkey,
                     sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
              FROM lineitem GROUP BY l_returnflag, l_partkey))
      WHERE rn <= 3""",
    "q04_max_order" -> """
      SELECT o_orderstatus, o_totalprice AS top_price,
             o_orderkey AS top_orderkey
      FROM (SELECT o_orderstatus, o_totalprice, o_orderkey,
                   row_number() OVER (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1""",
    "q05_region_revenue" -> """
      SELECT r_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name""",
    "q06_union_counts" -> """
      SELECT l_returnflag AS k, count(*) AS count,
             'lineitem_returnflag' AS src
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT o_orderstatus AS k, count(*) AS count, 'orders_status' AS src
      FROM orders GROUP BY o_orderstatus""",
    "q07_semi_join" -> """
      SELECT c_mktsegment, count(*) AS n_customers
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      GROUP BY c_mktsegment""",
    "q08_count_distinct" -> """
      SELECT o_orderpriority,
             count(DISTINCT o_custkey) AS n_custs,
             count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority"""
  )
}
