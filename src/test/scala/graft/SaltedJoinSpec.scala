package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin

/** Salting correctness on deliberately skewed data: 90% of rows share
  * one hot key. The salted join must equal the plain join exactly, and
  * the salted two-phase distinct count must equal the direct one. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val skewed = {
    import spark.implicits._
    spark.range(20000).select(
      when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 100).as("k"),
      ($"id" * 31 % 997).as("v"))
  }
  private lazy val dim = {
    import spark.implicits._
    spark.range(100).select($"id".as("k"), concat(lit("name_"), $"id").as("name"))
  }

  test("salted inner join equals the plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SaltedJoin.inner(skewed, dim, "k", saltFactor = 8)
      .select("k", "v", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("salted join spreads the hot key over multiple salt buckets") {
    import spark.implicits._
    val salts = skewed.filter($"k" === 7L)
      .withColumn("__salt", pmod(hash($"v"), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "salting failed to split the hot key")
  }

  test("salted two-phase distinct count equals the direct count") {
    val direct = skewed.groupBy("k")
      .agg(countDistinct("v").as("n_distinct_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SaltedJoin.saltedDistinctCount(skewed, "k", "v", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === direct)
  }
}
