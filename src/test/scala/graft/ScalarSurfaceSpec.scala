package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.B scalar-function families not already load-bearing in a
  * declared query, exercised on literal frames with hand-computed
  * expectations. One test per family keeps the surface auditable. */
class ScalarSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sqlText: String): org.apache.spark.sql.Row =
    spark.sql(sqlText).collect().head

  test("string family: substring/upper/trim/concat_ws/regexp/levenshtein") {
    val r = one("""SELECT
      substring('spark-engine', 7, 6)                    AS sub,
      upper('graft')                                     AS up,
      trim('  x  ')                                      AS tr,
      concat_ws('-', 'a', 'b', 'c')                      AS cw,
      regexp_extract('v4.1.2', 'v(\\d+)\\.(\\d+)', 2)    AS re,
      regexp_replace('a1b2', '\\d', '#')                 AS rr,
      levenshtein('kitten', 'sitting')                   AS lev,
      'ab%' LIKE 'ab\\%'                                 AS lk""")
    assert(r.getString(0) === "engine")
    assert(r.getString(1) === "GRAFT")
    assert(r.getString(2) === "x")
    assert(r.getString(3) === "a-b-c")
    assert(r.getString(4) === "1")
    assert(r.getString(5) === "a#b#")
    assert(r.getInt(6) === 3)
    assert(r.getBoolean(7))
  }

  test("date/time family: datediff/make_date/date_trunc/unix_timestamp/interval") {
    val r = one("""SELECT
      datediff(DATE '2024-03-01', DATE '2024-02-01')       AS dd,
      make_date(2024, 2, 29)                               AS md,
      CAST(date_trunc('quarter', DATE '2024-05-15') AS DATE) AS qt,
      unix_timestamp(TIMESTAMP '1970-01-02 00:00:00')      AS ut,
      DATE '2024-01-31' + INTERVAL 1 MONTH                 AS plus_m,
      year(TIMESTAMP '1999-12-31 23:59:59')                AS yr""")
    assert(r.getInt(0) === 29)
    assert(r.getDate(1).toString === "2024-02-29")
    assert(r.getDate(2).toString === "2024-04-01")
    assert(r.getLong(3) === 86400L)
    assert(r.getDate(4).toString === "2024-02-29")
    assert(r.getInt(5) === 1999)
  }

  test("math family: round/bround/pmod/sign/ceil/floor/sqrt/pow") {
    val r = one("""SELECT
      round(2.5)            AS r_half,
      bround(2.5)           AS br_half,
      bround(3.5)           AS br_odd,
      pmod(-7, 3)           AS pm,
      sign(-0.1)            AS sg,
      ceil(1.01)            AS ce,
      floor(-1.01)          AS fl,
      sqrt(144.0)           AS sq,
      pow(2, 10)            AS pw""")
    assert(r.getAs[java.math.BigDecimal](0).longValueExact() === 3L)
    assert(r.getAs[java.math.BigDecimal](1).longValueExact() === 2L) // half-even
    assert(r.getAs[java.math.BigDecimal](2).longValueExact() === 4L)
    assert(r.getInt(3) === 2) // pmod keeps the sign of the divisor
    assert(r.getDouble(4) === -1.0)
    assert(r.getAs[java.math.BigDecimal](5).longValueExact() === 2L)
    assert(r.getAs[java.math.BigDecimal](6).longValueExact() === -2L)
    assert(r.getDouble(7) === 12.0)
    assert(r.getDouble(8) === 1024.0)
  }

  test("array family: HOFs transform/filter/aggregate/zip_with/slice/sort") {
    val r = one("""SELECT
      transform(array(1, 2, 3), x -> x * x)                 AS tf,
      filter(array(1, 2, 3, 4), x -> x % 2 = 0)             AS fl,
      aggregate(array(1, 2, 3, 4), 0, (a, x) -> a + x)      AS ag,
      zip_with(array(1, 2), array(10, 20), (a, b) -> a * b) AS zw,
      slice(array(1, 2, 3, 4, 5), 2, 3)                     AS sl,
      sort_array(array(3, 1, 2), false)                     AS sa,
      array_contains(array(1, 2), 2)                        AS ac,
      size(array_distinct(array(1, 1, 2)))                  AS ad""")
    assert(r.getSeq[Int](0) === Seq(1, 4, 9))
    assert(r.getSeq[Int](1) === Seq(2, 4))
    assert(r.getInt(2) === 10)
    assert(r.getSeq[Int](3) === Seq(10, 40))
    assert(r.getSeq[Int](4) === Seq(2, 3, 4))
    assert(r.getSeq[Int](5) === Seq(3, 2, 1))
    assert(r.getBoolean(6))
    assert(r.getInt(7) === 2)
  }

  test("map family: keys/values/element_at/map_from_entries") {
    val r = one("""SELECT
      map_keys(map('a', 1, 'b', 2))                          AS mk,
      map_values(map('a', 1, 'b', 2))                        AS mv,
      element_at(map('a', 1), 'a')                           AS ea,
      element_at(map('a', 1), 'zz')                          AS miss,
      element_at(map_from_entries(array(struct('k', 7))), 'k') AS mfe""")
    assert(r.getSeq[String](0).sorted === Seq("a", "b"))
    assert(r.getSeq[Int](1).sorted === Seq(1, 2))
    assert(r.getInt(2) === 1)
    assert(r.isNullAt(3))
    assert(r.getInt(4) === 7)
  }

  test("JSON family: get_json_object/json_tuple/from_json/schema_of_json") {
    val r = one("""SELECT
      get_json_object('{"k": 42, "s": "x"}', '$.k')          AS gjo,
      from_json('{"k": 42}', 'k BIGINT').k                   AS fj,
      schema_of_json('{"k": 1}')                             AS soj""")
    assert(r.getString(0) === "42")
    assert(r.getLong(1) === 42L)
    assert(r.getString(2).toLowerCase.contains("bigint"))
    val jt = spark.sql(
      """SELECT json_tuple('{"a": "1", "b": "2"}', 'a', 'b')""").collect().head
    assert(jt.getString(0) === "1" && jt.getString(1) === "2")
  }

  test("conditional + null handling: nullif/nvl/coalesce/CASE") {
    val r = one("""SELECT
      nullif(5, 5)                   AS nif,
      nvl(NULL, 9)                   AS nv,
      coalesce(NULL, NULL, 3)        AS co,
      CASE WHEN 1 > 2 THEN 'a' WHEN 2 > 1 THEN 'b' ELSE 'c' END AS cs""")
    assert(r.isNullAt(0))
    assert(r.getInt(1) === 9)
    assert(r.getInt(2) === 3)
    assert(r.getString(3) === "b")
  }

  test("table registry: registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, TestSpark.sf0001)
    val r = spark.sql(
      """SELECT r_name, COUNT(*) AS n
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""").collect()
    assert(r.map(_.getLong(1)).sum === 25L)
    assert(spark.sql("SELECT COUNT(*) FROM documents").collect()
      .head.getLong(0) === 500L)
  }

  test("scalar UDF exemplar registers and runs (native expressions preferred)") {
    // The thin scalar-UDF path (§2.B): shown for API completeness — every
    // graft hot-path function is a native codegen Expression instead
    // (QuantizedDot scaladoc has the why: UDFs box, break codegen, and
    // hide from the optimizer).
    spark.udf.register("discount_band",
      (d: Double) => if (d < 0.03) "low" else if (d < 0.07) "mid" else "high")
    val bands = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .selectExpr("discount_band(l_discount) AS b")
      .groupBy("b").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bands.keySet === Set("low", "mid", "high"))
    assert(bands.values.sum === 6000L)
  }

  test("Observation API: per-query metrics piggyback on the action") {
    // The reference prints per-stage metrics with every frame
    // (DoublePsramBuffer480x480.cpp:209-214); Spark's Observation is the
    // declarative twin — named aggregates computed DURING the action, no
    // second pass over the data.
    import org.apache.spark.sql.Observation
    import org.apache.spark.sql.functions._
    val obs = Observation("scan_stats")
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity").cast("decimal(18,4)")).as("qty_sum"))
    val n = li.filter(col("l_quantity") > 0).count()
    val metrics = obs.get
    assert(metrics("rows_seen").asInstanceOf[Long] === 6000L)
    assert(n <= 6000L)
    assert(metrics("qty_sum") != null)
  }

  test("synthetic datagen: spark.range + rand(seed) is replay-deterministic") {
    // §2.B datagen (reference A20's sprite init analog): seeded rand is
    // deterministic PER PARTITION — stable under a fixed partitioning,
    // which is the contract any synthetic-fixture generator relies on.
    import org.apache.spark.sql.functions._
    def gen() = spark.range(0, 1000, 1, 8)
      .select(col("id"), rand(42).as("u"), randn(42).as("g"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val a = gen()
    val b = gen()
    assert(a === b)
    assert(a.map(_._2).distinct.length > 900) // actually random-looking
    assert(a.forall(t => t._2 >= 0.0 && t._2 < 1.0))
  }

  test("ORC scan round-trips, and binaryFile ingests raw blobs") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    docs.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).collect().head.getLong(0) ===
      docs.agg(sum("n_chars")).collect().head.getLong(0))
    // binaryFile: the ingest format for real multimodal blobs
    // (MultimodalOps synthesizes bytes today; this is the production door)
    val raw = java.nio.file.Files.createTempDirectory("graft-bin")
    java.nio.file.Files.write(raw.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(raw.resolve("b.bin"), Array[Byte](4, 5))
    val bf = spark.read.format("binaryFile").load(raw.toString)
    val rows = bf.select("path", "length").collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1))).toSet
    assert(rows === Set(("a.bin", 3L), ("b.bin", 2L)))
    assert(bf.schema.fieldNames.contains("content"))
  }

  test("CSV and JSON scans round-trip the events table") {
    // §2.B aux scans: the same rows come back through csv and json codecs.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-scan").toString
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    ev.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true")
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .csv(s"$dir/csv")
    val fromJson = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
      .json(s"$dir/json")
    assert(fromCsv.count() === ev.count())
    assert(fromJson.count() === ev.count())
    val a = fromCsv.agg(sum("value"), sum("event_id")).collect().head
    val b = fromJson.agg(sum("value"), sum("event_id")).collect().head
    assert(a.getLong(1) === b.getLong(1))
  }

  test("parameterized SQL: named/positional markers and IDENTIFIER()") {
    // The injection-safe SQL entry path — parameters bind as typed
    // literals, never string-spliced; IDENTIFIER() binds a VALUE as a
    // table/column NAME (the safe form of dynamic table dispatch a
    // multi-tenant 100 TB warehouse needs). Untrusted input through
    // these markers cannot change query structure.
    val named = spark.sql("SELECT :lo + :hi AS v",
      Map[String, Any]("lo" -> 40, "hi" -> 2))
    assert(named.head.getInt(0) === 42)
    val pos = spark.sql("SELECT ? * ? AS v", Array[Any](6, 7))
    assert(pos.head.getInt(0) === 42)

    Tables.load(spark, TestSpark.sf0001, "orders")
      .createOrReplaceTempView("param_orders_v")
    val viaIdent = spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
      Map[String, Any]("t" -> "param_orders_v"))
    val direct = spark.table("param_orders_v").count()
    assert(viaIdent.head.getLong(0) === direct)
    // a parameter is a literal: it cannot smuggle in structure
    val err = intercept[Exception] {
      spark.sql("SELECT COUNT(*) AS n FROM IDENTIFIER(:t)",
        Map[String, Any]("t" -> "param_orders_v WHERE 1=0")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("identifier"))
  }

  test("TIMESTAMP_NTZ: wall-clock type is timezone-shift invariant") {
    // TIMESTAMP (ltz) stores an instant — its wall-clock reading moves
    // with the session timezone; TIMESTAMP_NTZ stores the wall clock
    // itself. Event-time analytics over sources that log local wall
    // time need NTZ to survive a session-timezone change bit-identically.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utc = spark.sql(
        """SELECT CAST(TIMESTAMP_NTZ'2024-03-10 12:00:00' AS STRING) AS ntz,
                  CAST(TIMESTAMP'2024-03-10 12:00:00' AS STRING) AS ltz""")
        .head
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = spark.sql(
        """SELECT CAST(TIMESTAMP_NTZ'2024-03-10 12:00:00' AS STRING) AS ntz,
                  CAST(TIMESTAMP'2024-03-10 12:00:00' AS STRING) AS ltz""")
        .head
      assert(utc.getString(0) === ny.getString(0)) // NTZ: same wall clock
      assert(spark.sql("SELECT typeof(TIMESTAMP_NTZ'2024-01-01 00:00:00')")
        .head.getString(0) === "timestamp_ntz")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
