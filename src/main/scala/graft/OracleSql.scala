package graft

/** ANSI-SQL oracles for [[Queries]], runnable by DuckDB over the same
  * parquet tables. Design rules (SURVEY.md §5.1): every statement ends with
  * an explicit ORDER BY on a deterministic key; money aggregates cast to
  * exact DECIMAL BEFORE arithmetic (same as the Spark side); counts cast to
  * BIGINT (DuckDB sums of integers widen to HUGEINT otherwise); timestamps
  * leave the query as formatted strings so physical precision (ns vs µs)
  * can never skew the comparison.
  */
object OracleSql {

  val sql: Map[String, String] = Map(

    "agg_group_count" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_mode" ->
      """SELECT event_type AS mode_value FROM
           (SELECT event_type, count(*) AS c FROM events GROUP BY event_type)
         ORDER BY c DESC, event_type LIMIT 1""",

    "agg_funnel_flags" ->
      """SELECT user_id,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
             strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
             strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "dedup_latest" ->
      """SELECT user_id, event_type, event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
             value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                     ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "sort_global" ->
      """SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
         FROM events ORDER BY CAST(ts AS TIMESTAMP), event_id""",

    "topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "join_funnel_inner" ->
      """SELECT c.c_mktsegment, o.o_orderstatus,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment, o.o_orderstatus
         ORDER BY c.c_mktsegment, o.o_orderstatus""",

    "join_left_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
         ORDER BY c_custkey""",

    "join_left_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
         ORDER BY c_custkey""",

    "filter_since" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE ts >= TIMESTAMP '2024-01-15'
         GROUP BY event_type ORDER BY event_type""",

    "filter_isin" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE event_type IN ('purchase', 'signup')
         GROUP BY event_type ORDER BY event_type""",

    "filter_not_isin" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE event_type NOT IN ('error', 'view')
         GROUP BY event_type ORDER BY event_type""",

    "filter_notnull_cast" ->
      """SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(count(*) AS BIGINT) AS cnt
         FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events ORDER BY event_id""",

    "project_drop" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
         FROM orders ORDER BY o_orderkey""",

    "union_by_name" ->
      """SELECT o_orderkey % 10 AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(o_totalprice) AS BIGINT) AS n_price,
             CAST(count(o_orderstatus) AS BIGINT) AS n_status,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
         FROM (SELECT o_orderkey, o_totalprice FROM orders
               UNION ALL BY NAME
               SELECT o_orderkey, o_orderstatus FROM orders)
         GROUP BY bucket ORDER BY bucket""",

    "scan_parquet" ->
      """SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
             CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "funnel_flagship" ->
      """WITH latest AS (
           SELECT * FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE ts >= TIMESTAMP '2024-01-10')
           WHERE rn = 1)
         SELECT c.c_mktsegment AS mktsegment,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
             CAST(count(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
             CAST(count(CASE WHEN e.event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
             CAST(CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM latest e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY mktsegment"""
  )
}
