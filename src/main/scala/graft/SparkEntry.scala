package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.WarpOps._
import graft.ops.WarpOps.Order

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with an equivalent DuckDB oracle in [[oracleSql]].
  *
  * Float discipline: double sums are accumulated as decimal(28,6) and cast
  * back to double, so Spark's partial-aggregation order and DuckDB's scan
  * order produce bit-identical results (exact decimal addition is
  * associative; the per-row double->decimal rounding is deterministic in
  * both engines). Row-level double arithmetic (a*b etc.) is IEEE-identical
  * everywhere and needs no care.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts is nanosecond-precision parquet, which Spark only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in Verify/Bench sessions).
    // Normalize to a naive microsecond timestamp; `DIV` keeps the integer
    // math exact (a double division would lose precision on int64 nanos).
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case None    => df
    }
  }

  /** Order-insensitive exact double sum (see class doc). */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")
  /** Matching exact average: exact decimal sum, one double division. */
  private def davg(c: Column): Column = (sum(c.cast(DecimalType(28, 6))).cast("double") / count(c))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregate (Data.swift:260-263): grouped agg with computed measures
    "q1_agg" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      l.warpFilter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- calculate (Data.swift:221-230): derived column, then filter + sort
    "q_calc_filter" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .calculate(Seq("revenue" -> col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .warpFilter(col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .selectColumns(Seq("l_orderkey", "l_linenumber", "revenue"))
        .warpSort(Seq(Order(col("l_orderkey")), Order(col("l_linenumber"))))
    }),

    // ---- calculate snapshot semantics: all exprs see the PRE-update row
    "q_calc_snapshot" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .calculate(Seq(
          "l_quantity" -> (col("l_quantity") * 2),
          "qty_plus" -> (col("l_quantity") + lit(1.0))))
        .selectColumns(Seq("l_orderkey", "l_linenumber", "l_quantity", "qty_plus"))
        .warpSort(Seq(Order(col("l_orderkey")), Order(col("l_linenumber"))))
    }),

    // ---- selectColumns + limit + offset (Data.swift:232-238,256-258)
    "q_limit_offset" -> ((s, dir) => {
      T(s, dir, "orders")
        .warpSort(Seq(Order(col("o_orderkey"))))
        .selectColumns(Seq("o_orderkey", "o_totalprice", "O_ORDERPRIORITY"))
        .offset(10).limit(100)
    }),

    // ---- sort: multi-key, string + numeric-desc collation (Data.swift:81-111)
    "q_sort" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .selectColumns(Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"))
        .warpSort(Seq(
          Order(col("l_returnflag"), ascending = true, numeric = false),
          Order(col("l_quantity"), ascending = false),
          Order(col("l_orderkey")), Order(col("l_linenumber"))))
    }),

    // ---- distinct (Data.swift:245-246)
    "q_distinct" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .selectColumns(Seq("l_returnflag", "l_linestatus"))
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- unique: distinct values of one expression (Data.swift:252-254)
    "q_unique" -> ((s, dir) =>
      T(s, dir, "part").unique(col("p_brand"), "p_brand").orderBy("p_brand")),

    // ---- union by name, union-of-schemas (Data.swift:300-304)
    "q_union" -> ((s, dir) => {
      val c = T(s, dir, "customer").select(
        col("c_name").as("name"), col("c_acctbal").as("acctbal"), lit("customer").as("kind"))
      val su = T(s, dir, "supplier").select(
        col("s_name").as("name"), lit("supplier").as("kind"))
      c.warpUnion(su).orderBy("kind", "name")
    }),

    // ---- join inner: equi-extraction, shuffle join at scale (Data.swift:113-145)
    "q_join_inner" -> ((s, dir) => {
      val l = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      l.warpJoin(o, l("l_orderkey") === o("o_orderkey"), "inner")
        .groupBy("o_orderpriority")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // ---- join left-outer with a broadcast dimension
    "q_join_left" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val c = T(s, dir, "customer").warpFilter(col("c_acctbal") > 5000)
      o.warpJoin(c, o("o_custkey") === c("c_custkey"), "left_outer", broadcastRight = true)
        .selectColumns(Seq("o_orderkey", "c_name", "c_acctbal"))
        .warpSort(Seq(Order(col("o_orderkey"))))
    }),

    // ---- rank / running aggregation (Data.swift:306-311)
    "q_rank" -> ((s, dir) => {
      T(s, dir, "orders")
        .rank(Seq(
          ("rn", w => row_number().over(w)),
          ("running", w => sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w).cast("double"))),
          Seq(Order(col("o_orderkey"))))
        .selectColumns(Seq("o_orderkey", "o_totalprice", "rn", "running"))
        .warpSort(Seq(Order(col("o_orderkey"))))
    }),

    // ---- pivot (Data.swift:265, Raster.swift:984-1050)
    "q_pivot" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .warpPivot(Seq(col("l_linestatus")), Seq("l_returnflag"), dsum(col("l_quantity")))
        .orderBy("l_returnflag")
    }),

    // ---- flatten / melt (Data.swift:270-276)
    "q_flatten" -> ((s, dir) => {
      T(s, dir, "part")
        .selectColumns(Seq("p_partkey", "p_brand", "p_type"))
        .flatten("cell_value", Some("col_name"), Some(("row_id", col("p_partkey"))))
        .warpSort(Seq(Order(col("row_id")), Order(col("col_name"), numeric = false)))
    }),

    // ---- explode vertically (QBEExplodeStep.swift:230)
    "q_explode_vertical" -> ((s, dir) => {
      T(s, dir, "documents")
        .warpFilter(col("doc_id") < 100)
        .explodeVertically("text", " ")
        .select(col("doc_id"), col("text").as("word"))
        .orderBy("doc_id", "word")
    }),

    // ---- explode horizontally (QBEExplodeStep.swift:327)
    "q_explode_horizontal" -> ((s, dir) => {
      T(s, dir, "orders")
        .explodeHorizontally("o_orderpriority", "-", 2)
        .selectColumns(Seq("o_orderkey", "o_orderpriority_1", "o_orderpriority_2"))
        .warpSort(Seq(Order(col("o_orderkey"))))
    }),

    // ---- dummies / one-hot (QBEDummiesStep.swift:15-96)
    "q_dummies" -> ((s, dir) => {
      T(s, dir, "orders")
        .dummies("o_orderstatus")
        .selectColumns(Seq("o_orderkey", "o_orderstatus_F", "o_orderstatus_O", "o_orderstatus_P"))
        .warpSort(Seq(Order(col("o_orderkey"))))
    }),

    // ---- search across all columns (QBESearchStep.swift:4)
    "q_search" -> ((s, dir) => {
      T(s, dir, "part")
        .search("widget")
        .selectColumns(Seq("p_partkey", "p_name"))
        .warpSort(Seq(Order(col("p_partkey"))))
    }),

    // ---- filter-set / IN (QBERowsStep.swift:88)
    "q_filterset" -> ((s, dir) => {
      T(s, dir, "lineitem")
        .filterSet("l_returnflag", Seq("A", "R"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // ---- time-bucketed aggregation over the events table
    "q_events_window" -> ((s, dir) => {
      T(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("hour", "event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_calc_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice*(1.0-l_discount) AS revenue
         FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber""",
    "q_calc_snapshot" ->
      """SELECT l_orderkey, l_linenumber, l_quantity*2 AS l_quantity, l_quantity+1.0 AS qty_plus
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         ORDER BY o_orderkey LIMIT 100 OFFSET 10""",
    "q_sort" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
         ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_unique" -> "SELECT DISTINCT p_brand FROM part ORDER BY p_brand",
    "q_union" ->
      """SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
         UNION ALL BY NAME
         SELECT s_name AS name, 'supplier' AS kind FROM supplier
         ORDER BY kind, name""",
    "q_join_inner" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         COUNT(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_left" ->
      """SELECT o_orderkey, c_name, c_acctbal
         FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
         ON o_custkey = c_custkey ORDER BY o_orderkey""",
    "q_rank" ->
      """SELECT o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INT) AS rn,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
              OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS running
         FROM orders ORDER BY o_orderkey""",
    "q_pivot" ->
      """SELECT l_returnflag,
         CAST(SUM(CASE WHEN l_linestatus='F' THEN CAST(l_quantity AS DECIMAL(28,6)) END) AS DOUBLE) AS F,
         CAST(SUM(CASE WHEN l_linestatus='O' THEN CAST(l_quantity AS DECIMAL(28,6)) END) AS DOUBLE) AS O
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_flatten" ->
      """SELECT row_id, col_name, cell_value FROM (
           SELECT p_partkey AS row_id, 'p_partkey' AS col_name, CAST(p_partkey AS VARCHAR) AS cell_value FROM part
           UNION ALL
           SELECT p_partkey, 'p_brand', p_brand FROM part
           UNION ALL
           SELECT p_partkey, 'p_type', p_type FROM part
         ) ORDER BY row_id, col_name""",
    "q_explode_vertical" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word
         FROM documents WHERE doc_id < 100 ORDER BY doc_id, word""",
    "q_explode_horizontal" ->
      """SELECT o_orderkey,
         string_split(o_orderpriority, '-')[1] AS o_orderpriority_1,
         string_split(o_orderpriority, '-')[2] AS o_orderpriority_2
         FROM orders ORDER BY o_orderkey""",
    "q_dummies" ->
      """SELECT o_orderkey,
         o_orderstatus = 'F' AS o_orderstatus_F,
         o_orderstatus = 'O' AS o_orderstatus_O,
         o_orderstatus = 'P' AS o_orderstatus_P
         FROM orders ORDER BY o_orderkey""",
    "q_search" ->
      """SELECT p_partkey, p_name FROM part
         WHERE lower(p_name) LIKE '%widget%' OR lower(p_brand) LIKE '%widget%'
            OR lower(p_type) LIKE '%widget%'
         ORDER BY p_partkey""",
    "q_filterset" ->
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
         WHERE l_returnflag IN ('A','R') GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
