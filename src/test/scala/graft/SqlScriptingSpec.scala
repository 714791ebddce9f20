package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark 4.1's procedural SQL surfaces: SQL scripting (BEGIN…END with
  * DECLARE/WHILE — the orchestration layer that replaces driver-side
  * glue code for multi-statement maintenance jobs), session variables,
  * EXECUTE IMMEDIATE with bound parameters, and SQL-defined TABLE
  * functions. Together with q90 (pipe syntax + inlined scalar SQL UDF)
  * this closes the SQL entry-path inventory.
  */
class SqlScriptingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("SQL scripting: BEGIN/DECLARE/WHILE/END runs as one script") {
    withConf("spark.sql.scripting.enabled", "true") {
      val r = spark.sql(
        """BEGIN
          |  DECLARE tot INT DEFAULT 0;
          |  SET tot = 10;
          |  WHILE tot < 13 DO
          |    SET tot = tot + 1;
          |  END WHILE;
          |  SELECT tot AS result;
          |END""".stripMargin).collect()
      assert(r.map(_.getInt(0)).toSeq === Seq(13))
    }
  }

  test("session variables: DECLARE / SET VARIABLE / read in a query") {
    spark.sql("DECLARE OR REPLACE VARIABLE graft_thresh DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE graft_thresh = 0.05")
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .createOrReplaceTempView("li_var_v")
    val n = spark.sql(
      "SELECT COUNT(*) FROM li_var_v WHERE l_discount > graft_thresh")
      .head.getLong(0)
    val direct = spark.sql(
      "SELECT COUNT(*) FROM li_var_v WHERE l_discount > 0.05")
      .head.getLong(0)
    assert(n === direct && n > 0)
  }

  test("EXECUTE IMMEDIATE binds parameters into dynamic SQL") {
    val r = spark.sql("EXECUTE IMMEDIATE 'SELECT ? * ? AS v' USING 6, 7")
    assert(r.head.getInt(0) === 42)
    // INTO a session variable — the scripting-era assignment form
    spark.sql("DECLARE OR REPLACE VARIABLE graft_ei INT DEFAULT 0")
    spark.sql("EXECUTE IMMEDIATE 'SELECT 21 * 2' INTO graft_ei")
    assert(spark.sql("SELECT graft_ei").head.getInt(0) === 42)
  }

  test("SQL-defined TABLE function inlines like a parameterized view") {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_first_n(k INT)
        |RETURNS TABLE (v INT)
        |RETURN SELECT explode(sequence(1, k)) AS v""".stripMargin)
    val r = spark.sql(
      "SELECT SUM(v) AS s, COUNT(*) AS n FROM graft_first_n(10)").head
    assert(r.getLong(0) === 55L && r.getLong(1) === 10L)
  }
}
