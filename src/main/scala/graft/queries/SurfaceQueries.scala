package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Round-6 relational-surface additions (q70-q74): the custom DSv2
  * source under the gate, null-semantics joins, ordered string
  * aggregation, bitwise aggregates, and a log-free TF-IDF.
  *
  * All follow the repo determinism policy (total ORDER BY; money through
  * DECIMAL(18,4); any cross-engine double produced by exactly ONE
  * correctly-rounded IEEE op on integer-exact inputs, so DuckDB and
  * Spark agree bit-for-bit).
  */
object SurfaceQueries {

  // ---------------------------------------------------------------- q70
  // The custom DataSource V2 generator (sources/RangeSource) under the
  // oracle gate. The filter bounds are CONSUMED by the source: they
  // narrow per-reader ranges exactly and prune whole planned slices
  // (RangeSourceSpec asserts 14 of 32 survive), so Spark re-evaluates
  // nothing — the DSv2 contract that makes a 100 TB scan read only the
  // splits that can match. The oracle rebuilds the range relationally
  // with generate_series.
  private val q70 = QueryDef(
    "q70_range_source",
    (s, _) => {
      import s.implicits._
      s.read.format("graftrange")
        .option("start", 0L).option("end", 500000L).option("slices", 32)
        .load()
        .filter($"id" >= 100000L && $"id" < 400000L)
        .groupBy(pmod($"id", lit(7L)).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum($"id").as("sum_id"),
          sum($"squared").as("sum_sq"))
        .orderBy($"bucket")
    },
    Some("""SELECT id % 7 AS bucket, COUNT(*) AS n,
        CAST(SUM(id) AS BIGINT) AS sum_id,
        CAST(SUM(id * id) AS BIGINT) AS sum_sq
      FROM generate_series(100000, 399999) t(id)
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q71
  // NOT IN under three-valued logic — the null-aware anti join. Two
  // variants, one output row each: 'no_nulls' is an ordinary anti
  // (subquery has no NULL custkeys), 'with_nulls' plants a NULL in the
  // subquery, so by SQL semantics `x NOT IN (...)` can never be TRUE and
  // the count MUST be 0. An engine that compiled NOT IN to a plain
  // left-anti join would return a nonzero count there — the 0 is the
  // graded evidence. Spark plans the broadcastable single-key form as
  // BroadcastHashJoin LeftAnti with NAAJ (null-aware), asserted in
  // PlanShapeSpec — at scale the build side is the (small) subquery
  // output, so null-awareness costs one broadcast flag, not a shape
  // change. Expressed through the SQL entry path.
  private val naajSql =
    """SELECT 'no_nulls' AS variant, COUNT(*) AS n_cust
      FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      UNION ALL
      SELECT 'with_nulls' AS variant, COUNT(*) AS n_cust
      FROM customer
      WHERE c_custkey NOT IN
        (SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_custkey END
         FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY variant"""

  private val q71 = QueryDef(
    "q71_not_in_nulls",
    (s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(naajSql)
    },
    Some(naajSql))

  // ---------------------------------------------------------------- q72
  // Ordered string aggregation (LISTAGG/STRING_AGG): the one aggregate
  // whose VALUE depends on intra-group order, so determinism needs an
  // explicit sort — collect_set is unordered by contract, array_sort
  // pins it. The distinct-set form keeps group payloads bounded at
  // scale (|statuses| ≤ 3, |months| ≤ 12 here) — an unbounded listagg
  // over raw rows is the anti-pattern version.
  private val q72 = QueryDef(
    "q72_string_agg",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          concat_ws("|", array_sort(collect_set($"o_orderstatus")))
            .as("statuses"),
          concat_ws("|",
            array_sort(collect_set(date_format($"o_orderdate", "yyyy-MM"))))
            .as("months"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
          AS statuses,
        string_agg(DISTINCT strftime(o_orderdate, '%Y-%m'), '|'
          ORDER BY strftime(o_orderdate, '%Y-%m')) AS months,
        COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q73
  // Bitwise aggregate family (bit_and / bit_or / bit_xor) plus scalar
  // bit ops in the grouping key — integer-exact everywhere, so the hash
  // gate is airtight. bit_xor over a key column doubles as a cheap
  // order-independent set fingerprint (the same trick q68's audit could
  // use to compare table snapshots without sorting).
  private val q73 = QueryDef(
    "q73_bitwise_aggs",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .withColumn("flagbits",
          shiftleft($"l_linenumber".cast("bigint"), 2)
            .bitwiseOR($"l_orderkey".bitwiseAND(lit(3L))))
        .groupBy($"l_returnflag")
        .agg(
          expr("bit_and(l_linenumber)").cast("bigint").as("and_ln"),
          expr("bit_or(l_linenumber)").cast("bigint").as("or_ln"),
          expr("bit_xor(l_orderkey)").as("xor_key"),
          expr("bit_xor(flagbits)").as("xor_flag"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(bit_and(l_linenumber) AS BIGINT) AS and_ln,
        CAST(bit_or(l_linenumber) AS BIGINT) AS or_ln,
        CAST(bit_xor(l_orderkey) AS BIGINT) AS xor_key,
        CAST(bit_xor((l_linenumber::BIGINT << 2) | (l_orderkey & 3))
          AS BIGINT) AS xor_flag,
        COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q74
  // TF-IDF top-3 terms per document, log-free: score = tf·N/df computed
  // as CAST(tf*N AS DOUBLE)/df — tf*N is integer-exact (< 2^53), the
  // division is ONE correctly-rounded IEEE op, so Spark and DuckDB agree
  // bit-for-bit (ln-based idf would gamble the hash on libm rounding).
  // Monotone in the classic tf·log(N/df) ranking for fixed tf? No — but
  // it IS a faithful idf weighting (strictly decreasing in df), which is
  // what the operator demonstrates. Shape at 100 TB: tf is one shuffle
  // on (doc, term); df reuses tf grouped by term (no second scan); N is
  // a broadcast scalar; the per-doc top-3 is a bounded window over the
  // restricted report docs only.
  private val q74 = QueryDef(
    "q74_tfidf_top_terms",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val terms = docs
        .select($"doc_id",
          explode(split(lower($"text"), "[^a-z]+")).as("term"))
        .filter(length($"term") >= 3)
      val tf = terms.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.select(countDistinct($"doc_id").as("n_docs"))
      val scored = tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score",
          ($"tf" * $"n_docs").cast("double") / $"df")
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"term".asc)
      scored.filter($"doc_id" < 20)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"doc_id", $"rk".cast("bigint").as("rk"), $"term",
          $"tf", $"df", $"score")
        .orderBy($"doc_id", $"rk")
    },
    Some("""WITH terms AS (
        SELECT doc_id, t.term
        FROM documents,
          LATERAL unnest(regexp_split_to_array(lower(text), '[^a-z]+'))
            AS t(term)
        WHERE length(t.term) >= 3),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tf, df, score,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term ASC) AS rk
        FROM scored WHERE doc_id < 20)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score
      FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk"""))

  // ---------------------------------------------------------------- q75
  // Correlated LATERAL subquery with ORDER BY ... LIMIT — per-nation
  // top-2 customers "for each row of the left table". Catalyst must
  // DECORRELATE the limit (rewrite to a partitioned rank filter /
  // aligned join) because executing the inner query per outer row is
  // exactly the per-row re-execution that cannot exist at 100 TB; the
  // SQL is the user-facing surface, the decorrelated plan is the scale
  // story (same contract as q63's correlated scalar aggregates).
  // Output columns are raw parquet values — no arithmetic, hash-safe.
  private val lateralSql =
    """SELECT n.n_name, c.c_name, c.c_acctbal
      FROM nation n,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      ORDER BY n.n_name, c.c_acctbal DESC, c.c_name"""

  private val q75 = QueryDef(
    "q75_lateral_topn",
    (s, dir) => {
      Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(lateralSql)
    },
    Some(lateralSql))

  // ---------------------------------------------------------------- q76
  // IGNORE NULLS window functions (first/last/nth_value) — the "carry
  // forward the last observed value" primitive (gap-filling sensor
  // reads, last-known-good config, sparse attributes). Nulls are
  // planted deterministically (price visible only on 'F' orders); the
  // explicit ROWS frame + unique o_orderkey ordering make every carried
  // value unambiguous. Plain per-partition window — one shuffle on
  // o_custkey, no global sort before the final ORDER BY.
  private val q76 = QueryDef(
    "q76_ignore_nulls",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .withColumn("pf",
          when($"o_orderstatus" === "F", $"o_totalprice"))
        .select($"o_orderkey", $"o_custkey",
          last($"pf", ignoreNulls = true).over(w).as("last_f_price"),
          first($"pf", ignoreNulls = true).over(w).as("first_f_price"),
          nth_value($"pf", 2, ignoreNulls = true).over(w)
            .as("second_f_price"))
        .orderBy($"o_orderkey")
    },
    // DuckDB spells IGNORE NULLS inside the call parens; Spark SQL
    // spells it after them — one of the dialect gaps the oracle map
    // exists for.
    Some("""SELECT o_orderkey, o_custkey,
        last_value(pf IGNORE NULLS) OVER w AS last_f_price,
        first_value(pf IGNORE NULLS) OVER w AS first_f_price,
        nth_value(pf, 2 IGNORE NULLS) OVER w AS second_f_price
      FROM (SELECT o_orderkey, o_custkey,
              CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS pf
            FROM orders)
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q77
  // regexp_extract_all: the one regexp function that returns a SET of
  // matches per row (the scan-stage primitive under tokenizers and PII
  // scanners like q51). Pattern kept in the Java/RE2-portable subset;
  // the array is folded to count/total-length/joined-string so the
  // compare is scalar-typed.
  private val q77 = QueryDef(
    "q77_regexp_extract_all",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter($"doc_id" < 30)
        .select($"doc_id",
          regexp_extract_all(lower($"text"), lit("[a-z]{7,}"), lit(0))
            .as("long_words"))
        .select($"doc_id",
          size($"long_words").cast("bigint").as("n_long"),
          aggregate($"long_words", lit(0L),
            (acc, x) => acc + length(x)).as("total_len"),
          concat_ws("|", $"long_words").as("joined"))
        .orderBy($"doc_id")
    },
    // DuckDB yields NULL (not an empty list) when nothing matches;
    // Spark yields []. COALESCE pins the empty-set convention.
    Some("""SELECT doc_id,
        CAST(COALESCE(len(words), 0) AS BIGINT) AS n_long,
        CAST(COALESCE(list_sum(list_transform(words, w -> length(w))), 0)
          AS BIGINT) AS total_len,
        COALESCE(array_to_string(words, '|'), '') AS joined
      FROM (SELECT doc_id,
              regexp_extract_all(lower(text), '[a-z]{7,}') AS words
            FROM documents WHERE doc_id < 30)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q78
  // RANGE frame with INTERVAL bounds — the last frame type not yet
  // under the gate (q13 runs unbounded-preceding, q14 ROWS, q19
  // integer RANGE). The input is deliberately SPARSE (only days with
  // high-quantity lines exist), so RANGE over event time and ROWS over
  // row position genuinely disagree and the golden/oracle would catch
  // an engine conflating them. Window runs over per-day AGGREGATES
  // (q13/q14 rationale: never a global window over fact rows); sums
  // stay in exact decimals until the final double cast.
  // The window orders by the TIMESTAMP day (interval frames bind to
  // time-typed orderings in both engines); the output column is cast
  // to DATE because Spark's date_trunc returns timestamp while
  // DuckDB's returns date — CAST makes both emit date.
  private val intervalFrameSql =
    """WITH daily AS (
        SELECT date_trunc('day', l_shipdate) AS dt,
          SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev,
          COUNT(*) AS n_lines
        FROM lineitem WHERE l_quantity >= 49 GROUP BY 1)
      SELECT CAST(dt AS DATE) AS d,
        CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE) AS rev,
        n_lines,
        CAST(CAST(SUM(rev) OVER (ORDER BY dt
          RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
          AS DECIMAL(18,4)) AS DOUBLE) AS rev_7d,
        CAST(SUM(n_lines) OVER (ORDER BY dt
          RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
          AS BIGINT) AS lines_7d
      FROM daily ORDER BY d"""

  private val q78 = QueryDef(
    "q78_interval_range_frame",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(intervalFrameSql)
    },
    Some(intervalFrameSql))

  // ---------------------------------------------------------------- q80
  // Typed JSON: from_json with an EXPLICIT schema (q20 uses the untyped
  // get_json_object path) → struct field access → aggregation, plus a
  // to_json→re-extract round-trip counted per group. The explicit
  // schema is the 100 TB rule: schema-on-read inference over text is an
  // extra full pass and a drifting contract; `rt_ok = n_events` proves
  // serialize→parse closes over every row.
  private val q80 = QueryDef(
    "q80_json_typed",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("p", from_json($"props", lit("k INT")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"p.k".cast("bigint")).as("sum_k"),
          max($"p.k".cast("bigint")).as("max_k"),
          sum(when(get_json_object(
              to_json(struct($"p.k".as("k"))), "$.k")
              .cast("int") === $"p.k", 1L).otherwise(0L)).as("rt_ok"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
          AS sum_k,
        MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS rt_ok
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q81
  // Array higher-order functions under the gate (transform / filter /
  // exists / aggregate over per-order quantity arrays): the lambda
  // calculus the LLM-pipeline operators lean on (q24's dot products,
  // q47's packing) exercised as first-class surface. Arrays stay
  // BOUNDED (≤7 lineitems per order) per the collect policy; integer
  // casts keep every fold exact.
  private val q81 = QueryDef(
    "q81_array_hof",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_orderkey" < 300)
        .groupBy($"l_orderkey")
        .agg(array_sort(collect_list($"l_quantity".cast("bigint")))
          .as("qs"))
        .select($"l_orderkey",
          concat_ws(",", $"qs").as("qs_str"),
          size($"qs").cast("bigint").as("n"),
          aggregate($"qs", lit(0L), (acc, x) => acc + x * 2).as("sum2"),
          size(filter($"qs", _ > 25)).cast("bigint").as("n_big"),
          exists($"qs", _ >= 49).as("has49"))
        .orderBy($"l_orderkey")
    },
    Some("""WITH a AS (
        SELECT l_orderkey,
          list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        FROM lineitem WHERE l_orderkey < 300 GROUP BY 1)
      SELECT l_orderkey, array_to_string(qs, ',') AS qs_str,
        CAST(len(qs) AS BIGINT) AS n,
        CAST(list_sum(list_transform(qs, x -> x * 2)) AS BIGINT) AS sum2,
        CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_big,
        len(list_filter(qs, x -> x >= 49)) > 0 AS has49
      FROM a ORDER BY l_orderkey"""))

  // ---------------------------------------------------------------- q82
  // ANSI error-safe evaluation: the try_* family (try_cast over bad
  // numerics and invalid dates, try_divide over planted zero
  // denominators) — under ANSI mode (the Spark 4 default this engine
  // runs with) the non-try forms THROW, so try_* is the contract a
  // 100 TB pipeline uses to quarantine bad rows instead of killing the
  // job at task 40000 of 40001. All malformed values are planted
  // deterministically from o_orderkey. DuckDB mirrors TRY_CAST
  // directly; its integer division already yields NULL on /0, which is
  // exactly try_divide's semantics.
  private val q82 = QueryDef(
    "q82_try_semantics",
    (s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""WITH t AS (
          SELECT o_orderstatus, o_orderkey,
            CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
                 ELSE CAST(o_orderkey AS STRING) END AS sn,
            CASE WHEN o_orderkey % 5 = 0 THEN '2024-99-99'
                 ELSE '2024-01-15' END AS sd,
            o_orderkey % 4 AS denom
          FROM orders)
        SELECT o_orderstatus,
          COUNT(TRY_CAST(sn AS BIGINT)) AS n_parsed,
          SUM(TRY_CAST(sn AS BIGINT)) AS sum_parsed,
          COUNT(TRY_CAST(sd AS DATE)) AS n_dates,
          SUM(CASE WHEN try_divide(o_orderkey, denom) IS NULL
              THEN 1 ELSE 0 END) AS n_div_null,
          COUNT(*) AS n
        FROM t GROUP BY 1 ORDER BY 1""")
    },
    Some("""WITH t AS (
        SELECT o_orderstatus, o_orderkey,
          CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
               ELSE CAST(o_orderkey AS VARCHAR) END AS sn,
          CASE WHEN o_orderkey % 5 = 0 THEN '2024-99-99'
               ELSE '2024-01-15' END AS sd,
          o_orderkey % 4 AS denom
        FROM orders)
      SELECT o_orderstatus,
        COUNT(TRY_CAST(sn AS BIGINT)) AS n_parsed,
        CAST(SUM(TRY_CAST(sn AS BIGINT)) AS BIGINT) AS sum_parsed,
        COUNT(TRY_CAST(sd AS DATE)) AS n_dates,
        -- NULLIF: DuckDB's '/' casts to DOUBLE and its /0 answer changed
        -- across versions (NULL vs IEEE inf); NULLIF(denom,0) is NULL on
        -- every version, matching try_divide. CAST: integer SUM promotes
        -- to HUGEINT, which the driver's hasher treats as a distinct type.
        CAST(SUM(CASE WHEN o_orderkey / NULLIF(denom, 0) IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
        COUNT(*) AS n
      FROM t GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q83
  // The custom GENERATOR (UDTF tier, functions/NGramsGen) under the
  // gate through the LATERAL VIEW SQL surface: every word 3-gram of
  // each report doc with its 1-based position. Catalyst pushes the
  // doc_id predicate BELOW the Generate (generator output is
  // row-local), so the fan-out runs only over the selected docs — the
  // property that keeps generator queries scan-shaped at 100 TB. The
  // oracle rebuilds positions relationally with generate_series over
  // the token array.
  private val q83 = QueryDef(
    "q83_ngram_positions",
    (s, dir) => {
      Tables.load(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT doc_id, CAST(pos AS BIGINT) AS pos, gram
        FROM documents LATERAL VIEW ngrams_gen(text, 3) g AS pos, gram
        WHERE doc_id < 5 ORDER BY doc_id, pos""")
    },
    Some("""WITH tk AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t
        FROM documents WHERE doc_id < 5)
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
        array_to_string(t[u.i:u.i+2], ' ') AS gram
      FROM tk, LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i)
      ORDER BY doc_id, pos"""))

  // ---------------------------------------------------------------- q84
  // VARIANT (Spark 4's semi-structured type): parse_json → binary
  // variant, typed variant_get extraction, and a to_json canonical
  // round trip. Unlike q80's per-query struct schema, variant defers
  // the schema entirely — the 100 TB trade is storage+decode cost for
  // schema-drift immunity (new JSON keys don't break old readers).
  // The round-trip columns work because BOTH engines canonicalize to
  // minified JSON: Spark's to_json(parse_json(x)) and DuckDB's
  // json(x) emit byte-identical '{"k":87}' for this corpus, so
  // min/max/distinct over the round-tripped strings hash-match.
  private val q84 = QueryDef(
    "q84_variant_json",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        // project ONCE per row: parse_json/to_json are real
        // decode/encode work, and the three aggregate references would
        // otherwise each re-serialize the variant (measured 3.9 s
        // median → 1.3 s warm at sf0.1 from this hoist)
        .select($"event_type",
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          expr("to_json(parse_json(props))").as("j"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          countDistinct($"j").as("n_distinct_json"),
          min($"j").as("min_json"),
          max($"j").as("max_json"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
          AS sum_k,
        COUNT(DISTINCT CAST(json(props) AS VARCHAR)) AS n_distinct_json,
        MIN(CAST(json(props) AS VARCHAR)) AS min_json,
        MAX(CAST(json(props) AS VARCHAR)) AS max_json
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q85
  // RECURSIVE CTE (Spark 4's WITH RECURSIVE → UnionLoop/UnionLoopExec),
  // the engine-native iteration surface next to q39's hand-rolled
  // checkpointed label propagation and q64's closed-form sequence()
  // spine. The hierarchy is the implicit binary tree over s_suppkey
  // (parent(k) = k DIV 2, root 0, guard k > 0 against the 0→0
  // self-loop) — every supplier is reachable, the recursion depth is
  // ⌈log2(n)⌉ (7 levels at 100 suppliers, ~24 at 10M — each iteration
  // joins only the PREVIOUS level's rows against the supplier scan, so
  // the loop does bounded work per level at any scale, unlike a
  // transitive closure whose frontier is O(n²)). Depth table then
  // left-joins per-supplier revenue; output one row per depth. Exact
  // decimals throughout, one terminal cast to DOUBLE (repo policy).
  // DuckDB writes integer floor-division as `//`, Spark as `DIV` —
  // same function on non-negative keys.
  private val q85 = QueryDef(
    "q85_recursive_tree",
    (s, dir) => {
      // UnionLoop runs one JOB per tree level (10 at sf0.1, ~24 at 10M
      // suppliers) and re-executes the build side every iteration — a
      // fresh parquet scan per level cost 3.6 s at sf0.1. The key set
      // is a few MB per 10M suppliers, so materialize it ONCE as a
      // single in-memory partition (localCheckpoint truncates lineage;
      // coalesce(1) makes each per-level join a single task): 3.6 s →
      // 2.9 s warm at sf0.1. The remainder is per-level JOB latency
      // (the q39 effect — sequential micro-jobs are scheduler-bound
      // locally, amortized on a real cluster). The revenue CTE stays
      // on the full parquet scan outside the loop.
      Tables.load(s, dir, "supplier").select("s_suppkey")
        .coalesce(1).localCheckpoint()
        .createOrReplaceTempView("suppkeys_q85")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_q85")
      // TWO LEVELS PER ITERATION (round 21, guide §2.4 at job
      // granularity): UnionLoop's cost here is one JOB per recursion
      // step (~0.08 s each, scheduler-bound locally), so halving the
      // step count halves the query's fixed overhead. Each step joins
      // only the EVEN-depth rows of the previous step's output
      // (t.depth % 2 = 0) and emits BOTH their children (depth+1) and
      // grandchildren (depth+2); odd-depth rows are emitted but never
      // extended — their children are exactly the grandchildren the
      // even parent already produced. Every (skey, depth) row is
      // produced exactly once (d odd ⇒ by its even parent at d−1;
      // d even ≥ 2 ⇒ by its even grandparent at d−2 — the parities
      // are disjoint), so the tree RELATION is identical to the
      // one-level form and the oracle keeps the canonical recursion.
      // The recursive reference still appears once (kids); the
      // grandchild branch re-joins the supplier keys, not tree.
      s.sql("""WITH RECURSIVE tree(skey, depth) AS (
          SELECT s_suppkey, CAST(0 AS BIGINT) FROM suppkeys_q85
          WHERE s_suppkey = 0
          UNION ALL
          SELECT skey, depth FROM (
            WITH kids AS (
              SELECT s.s_suppkey AS k, t.depth + 1 AS d
              FROM suppkeys_q85 s JOIN tree t
                ON s.s_suppkey DIV 2 = t.skey AND t.depth % 2 = 0
              WHERE s.s_suppkey > 0)
            SELECT k AS skey, d AS depth FROM kids
            UNION ALL
            SELECT s2.s_suppkey AS skey, kids.d + 1 AS depth
            FROM kids JOIN suppkeys_q85 s2
              ON s2.s_suppkey DIV 2 = kids.k) step),
        rev AS (
          SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
            (1 - CAST(l_discount AS DECIMAL(18,4)))) AS r
          FROM lineitem_q85 GROUP BY 1)
        SELECT t.depth, COUNT(*) AS n_suppliers,
          CAST(CAST(SUM(COALESCE(rev.r, 0)) AS DECIMAL(18,4)) AS DOUBLE)
            AS total_revenue
        FROM tree t LEFT JOIN rev ON rev.l_suppkey = t.skey
        GROUP BY t.depth ORDER BY t.depth""")
    },
    Some("""WITH RECURSIVE tree(skey, depth) AS (
        SELECT s_suppkey, CAST(0 AS BIGINT) FROM supplier
        WHERE s_suppkey = 0
        UNION ALL
        SELECT s.s_suppkey, t.depth + 1
        FROM supplier s JOIN tree t ON s.s_suppkey // 2 = t.skey
        WHERE s.s_suppkey > 0),
      rev AS (
        SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (1 - CAST(l_discount AS DECIMAL(18,4)))) AS r
        FROM lineitem GROUP BY 1)
      SELECT t.depth, COUNT(*) AS n_suppliers,
        CAST(CAST(SUM(COALESCE(rev.r, 0)) AS DECIMAL(18,4)) AS DOUBLE)
          AS total_revenue
      FROM tree t LEFT JOIN rev ON rev.l_suppkey = t.skey
      GROUP BY t.depth ORDER BY t.depth"""))

  // ---------------------------------------------------------------- q86
  // NULL-SAFE equality join (<=> / IS NOT DISTINCT FROM). Unlike the
  // q71 NOT-IN row (three-valued logic making NULL poison an anti
  // join), <=> treats NULL as a VALUE — NULL keys match each other —
  // and, critically for scale, EqualNullSafe is still an EQUI-join
  // key: Catalyst hashes it like any other key (broadcast/SMJ/SHJ all
  // apply; plan-asserted no BNLJ in PlanShapeSpec). The OR-isnull
  // rewrite a user would hand-write instead degrades to a nested-loop
  // join — the difference between a shuffle and a cross product at
  // 100 TB. Both sides bucket their keys with k % 7 = 0 mapped to
  // NULL, so exactly one NULL group exists per side and must pair.
  private val q86 = QueryDef(
    "q86_null_safe_join",
    (s, dir) => {
      import s.implicits._
      def bucketed(tbl: String, key: String, out: String) =
        Tables.load(s, dir, tbl)
          .select(when(col(key) % 7 === 0, lit(null))
            .otherwise(col(key) % 7).as("bucket"))
          .groupBy($"bucket").agg(count(lit(1)).as(out))
      val o = bucketed("orders", "o_orderkey", "n_orders")
      val c = bucketed("customer", "c_custkey", "n_customers")
      o.join(c, o("bucket") <=> c("bucket"))
        .select(o("bucket"), $"n_orders", $"n_customers")
        .orderBy(o("bucket").asc_nulls_first)
    },
    Some("""WITH oa AS (
        SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderkey % 7 END AS bucket,
          COUNT(*) AS n_orders FROM orders GROUP BY 1),
      ca AS (
        SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE c_custkey % 7 END AS bucket,
          COUNT(*) AS n_customers FROM customer GROUP BY 1)
      SELECT oa.bucket, oa.n_orders, ca.n_customers
      FROM oa JOIN ca ON oa.bucket IS NOT DISTINCT FROM ca.bucket
      ORDER BY oa.bucket NULLS FIRST"""))

  // ---------------------------------------------------------------- q87
  // STRING COLLATION (Spark 4's collated string types): grouping under
  // UTF8_LCASE, where 'EN' and 'en' are THE SAME KEY — the engine-level
  // answer to case-insensitive analytics, replacing the lower()-
  // everywhere convention (and at scale, replacing it cheaply: the
  // collation is part of the type, so every comparison/hash/sort
  // downstream is collation-aware without per-row rewrites). Mixed case
  // is planted deterministically (even doc_ids upper-case their lang),
  // the group key is the collated column, and the emitted key is
  // lower(min(...)) — all members of a collated group are equal under
  // the comparator, so lower() of any representative is deterministic.
  // The oracle is the lower()-convention twin, which is exactly
  // equivalent for the ASCII lang codes in the corpus.
  private val q87 = QueryDef(
    "q87_collated_group",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(
          when($"doc_id" % 2 === 0, upper($"lang")).otherwise($"lang")
            .as("lang_mixed"),
          $"n_chars")
        .groupBy(expr("collate(lang_mixed, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          lower(min($"lang_mixed")).as("lang"))
        .select($"lang", $"n_docs", $"total_chars")
        .orderBy($"lang")
    },
    Some("""WITH m AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN UPPER(lang) ELSE lang END
          AS lang_mixed, n_chars FROM documents)
      SELECT LOWER(lang_mixed) AS lang, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM m GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q90
  // SQL PIPE SYNTAX (|>) + a SQL-defined UDF, Spark 4.1's two newest
  // SQL entry surfaces in one gated query. The |> chain (WHERE →
  // AGGREGATE → SELECT → ORDER BY) parses to exactly the same logical
  // plan as the nested form — pipe syntax is parser sugar, so every
  // Catalyst optimization applies unchanged. The money arithmetic
  // lives in a CREATE TEMPORARY FUNCTION ... RETURN expression: SQL
  // UDFs are MACRO-INLINED at analysis time (plan-asserted: no
  // ScalaUDF / BatchEvalPython anywhere), which is the scale answer
  // to shared business logic — unlike a JVM/Python UDF, an inlined
  // SQL UDF keeps codegen, pushdown and decimal exactness intact.
  // The oracle is the equivalent nested ANSI SQL.
  private val q90 = QueryDef(
    "q90_pipe_sql",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_q90")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
          p DOUBLE, d DOUBLE) RETURNS DECIMAL(38, 8)
        RETURN CAST(p AS DECIMAL(18,4)) * (1 - CAST(d AS DECIMAL(18,4)))""")
      s.sql("""FROM lineitem_q90
        |> WHERE l_shipdate <= '1998-09-01'
        |> AGGREGATE SUM(graft_disc_price(l_extendedprice, l_discount))
             AS rev_dec, COUNT(*) AS n_items GROUP BY l_returnflag
        |> SELECT l_returnflag,
             CAST(CAST(rev_dec AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             n_items
        |> ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem WHERE l_shipdate <= '1998-09-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q91
  // Native LISTAGG ... WITHIN GROUP (Spark 4.1) — the engine-native
  // upgrade of q72, which pinned ordered string aggregation through
  // the array_sort(collect_set(...)) composite because no aggregate
  // accepted an intra-group ORDER BY. WITHIN GROUP makes the
  // order-sensitivity EXPLICIT in the operator (the only aggregate
  // family whose value depends on element order); DISTINCT bounds the
  // group payload by the segment domain, so the aggregate stays
  // mergeable and bounded at any customer count — the same bounded-
  // payload rule q72 documents for 100 TB.
  private val q91 = QueryDef(
    "q91_listagg",
    (s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer_q91")
      Tables.load(s, dir, "nation").createOrReplaceTempView("nation_q91")
      s.sql("""SELECT n_name,
          listagg(DISTINCT c_mktsegment, ',')
            WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
          COUNT(*) AS n_customers
        FROM customer_q91 JOIN nation_q91 ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")
    },
    Some("""SELECT n_name,
        string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
          AS segments,
        COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  // ---------------------------------------------------------------- q92
  // Linear-REGRESSION aggregates (the regr_*/corr statistical family)
  // in the scale-safe EXACT form: slope and intercept per return flag
  // from the five exact decimal co-moment sums (n, Σx, Σy, Σxy, Σx²) —
  // each a mergeable partial a 100 TB two-phase aggregate combines
  // associatively — then ONE correctly-rounded IEEE division per
  // output (the repo float policy). Native regr_slope/corr stream
  // doubles through an order-dependent co-moment update, so their
  // last-ulp value depends on partitioning — fine for analysis,
  // unusable for a bit-exact gate; RegressionParitySpec pins the
  // native forms to this composite within 1e-9 relative. The final
  // arithmetic runs in DOUBLE over an IDENTICAL op tree in both
  // engines: each co-moment sum is first rescaled to a decimal whose
  // scaled integer fits the 53-bit mantissa (so decimal→double is ONE
  // correct rounding in both engines — the q13/q16 policy), then
  //   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
  //   intercept = (Σy·Σx² − Σx·Σxy) / (same denominator)
  // in IEEE ops, which are correctly rounded and therefore
  // bit-identical given identical inputs and tree shape. (A pure
  // wide-decimal form drifts instead: the sy·sxx-class products
  // overflow DECIMAL(38) and the engines round the overflow
  // differently — measured 1 ulp on intercept.)
  private val q92 = QueryDef(
    "q92_regression",
    (s, dir) => {
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem_q92")
      s.sql("""WITH m AS (
          SELECT l_returnflag,
            COUNT(*) AS n,
            SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
            SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
            SUM(CAST(l_quantity AS DECIMAL(18,4)) *
                CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy,
            SUM(CAST(l_quantity AS DECIMAL(18,4)) *
                CAST(l_quantity AS DECIMAL(18,4))) AS sxx
          FROM lineitem_q92 GROUP BY 1)
        SELECT l_returnflag, n,
          (CAST(n AS DOUBLE) * CAST(CAST(sxy AS DECIMAL(38,2)) AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
          (CAST(sy AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(CAST(sxy AS DECIMAL(38,2)) AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS intercept
        FROM m ORDER BY l_returnflag""")
    },
    Some("""WITH m AS (
        SELECT l_returnflag,
          COUNT(*) AS n,
          SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
          SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
          SUM(CAST(l_quantity AS DECIMAL(18,4)) *
              CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy,
          SUM(CAST(l_quantity AS DECIMAL(18,4)) *
              CAST(l_quantity AS DECIMAL(18,4))) AS sxx
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, n,
        (CAST(n AS DOUBLE) * CAST(CAST(sxy AS DECIMAL(38,2)) AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        (CAST(sy AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(CAST(sxy AS DECIMAL(38,2)) AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(CAST(sxx AS DECIMAL(38,2)) AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS intercept
      FROM m ORDER BY l_returnflag"""))

  val all: Seq[QueryDef] =
    Seq(q70, q71, q72, q73, q74, q75, q76, q77, q78, q80, q81, q82, q83,
      q84, q85, q86, q87, q90, q91, q92)
}

