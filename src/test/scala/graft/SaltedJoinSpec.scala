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

  test("q26-shaped token join survives a planted 100x-hot token") {
    // The exact shape q26 wires SaltedJoin into: (doc_id, lang, token)
    // probe rows joined to a (token, m_lang, cnt) model on the raw
    // token, with one token planted ~100x hotter than every other key.
    import spark.implicits._
    val toks = spark.range(5000).select(
      ($"id" % 50).as("doc_id"), lit("en").as("lang"),
      when($"id" % 100 =!= 0, lit("the"))
        .otherwise(concat(lit("w"), $"id" % 37)).as("token"))
    val model = toks.groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("m_lang", lit("en"))
    def scores(joined: org.apache.spark.sql.DataFrame) = joined
      .groupBy("doc_id", "lang", "m_lang")
      .agg(sum("cnt").as("score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sorted
    val plain = scores(toks.join(model, Seq("token")))
    val salted = scores(SaltedJoin.inner(toks, model, "token", saltFactor = 8))
    assert(salted === plain)
    // The hot token's probe rows must land in >1 salt bucket — i.e. no
    // single reducer owns the hot key's whole join.
    val salts = toks.filter($"token" === "the")
      .withColumn("__salt", pmod(hash($"doc_id", $"lang"), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "hot token was not spread across salt buckets")
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
