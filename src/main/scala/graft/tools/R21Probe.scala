package graft.tools

import graft.{Sessions, Tables}
import graft.Policy._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-21 measurement tool (guide §1, never in a query path): is the
  * TPC-H money family's per-row cost the DECIMAL arithmetic (BigDecimal
  * multiply at precision 38 + non-compact sum) or the scan? Runs q09's
  * aggregation three ways on the same input and times each:
  *   A. shipped form: sumMoney(dec(p)*(1-dec(d)) - dec(r)*dec(q))
  *   B. long-space:   per-row exact integer units, decimal(38,0) sum
  *   C. scan floor:   sum of the raw doubles (inexact — floor only)
  * and prints the three results so A ≡ B equality is visible. */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-r21probe")
    import spark.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    def joined = li.join(part, $"l_partkey" === $"p_partkey")

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-12s min=${reps.min}%.3f s reps=" +
        reps.map(r => f"$r%.3f").mkString(","))
      df.show(3, truncate = false)
    }

    val margin = revenue($"l_extendedprice", $"l_discount") -
      dec($"p_retailprice") * dec($"l_quantity")
    time("A decimal") {
      joined.groupBy($"p_brand")
        .agg((sumMoney(margin) / count(lit(1))).as("avg_margin"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand")
    }

    // long-space: units of 1e-8; per-row |value| <= 1e13, decimal sum
    val pu = round($"l_extendedprice" * 1e4).cast(LongType)
    val du = round($"l_discount" * 1e4).cast(LongType)
    val ru = round($"p_retailprice" * 1e4).cast(LongType)
    val qu = round($"l_quantity" * 1e4).cast(LongType)
    // margin_u8 = pu*(1e4-du) - ru*(qu/1e4 rescaled): quantity is
    // integral so qu = q*1e4; ru*q in 1e-8 units = ru * (qu div 10000) * 10000
    val marginU8 = pu * (lit(10000L) - du) -
      ru * ($"l_quantity".cast(LongType)) * lit(10000L)
    time("B long") {
      joined
        .groupBy($"p_brand")
        .agg(sum(marginU8.cast(DecimalType(38, 0))).as("su"),
          count(lit(1)).as("n_lines"))
        .select($"p_brand",
          (expr("CAST((CASE WHEN su < 0 THEN su - 5000 ELSE su + 5000 END)" +
            " DIV 10000 AS DOUBLE)") / lit(10000.0) / $"n_lines")
            .as("avg_margin"),
          $"n_lines")
        .orderBy($"p_brand")
    }

    // B2: like B, but the double→integer-units conversion is
    // floor(x*1e4 + 0.5) (pure codegen Math.floor; money inputs are
    // non-negative and land within ~3e-7 of an integer, so +0.5/floor
    // is the same nearest integer round() picks) instead of Spark's
    // BigDecimal-backed round().
    def u4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)).cast(LongType)
    val marginU8b = u4($"l_extendedprice") * (lit(10000L) - u4($"l_discount")) -
      u4($"p_retailprice") * ($"l_quantity".cast(LongType)) * lit(10000L)
    time("B2 floor-u") {
      joined
        .groupBy($"p_brand")
        .agg(sum(marginU8b.cast(DecimalType(38, 0))).as("su"),
          count(lit(1)).as("n_lines"))
        .select($"p_brand",
          (expr("CAST((CASE WHEN su < 0 THEN su - 5000 ELSE su + 5000 END)" +
            " DIV 10000 AS DOUBLE)") / lit(10000.0) / $"n_lines")
            .as("avg_margin"),
          $"n_lines")
        .orderBy($"p_brand")
    }

    time("C dbl floor") {
      joined.groupBy($"p_brand")
        .agg((sum($"l_extendedprice" * (lit(1.0) - $"l_discount") -
          $"p_retailprice" * $"l_quantity") / count(lit(1))).as("avg_margin"),
          count(lit(1)).as("n_lines"))
        .orderBy($"p_brand")
    }
    // ---- q24f scale proof (round-20 verdict item 6): the keyed-join
    // pqAssign rewrite was FLAT at sf0.1 (l2q dominates locally); A/B
    // the old crossJoin-and-reslice shape against the shipped
    // pre-explode + keyed-join shape on a ×16-widened corpus (32.8k
    // vectors) to show where the narrowed join input starts paying.
    if (args.length > 1 && args(1) == "pq") {
      import org.apache.spark.sql.expressions.Window
      val pqM = 8; val pqD = 8; val pqK = 16
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select($"vec_id", $"embedding")
      val wide = (0 until 16).map(i =>
        emb.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
          $"embedding")).reduce(_ unionAll _).localCheckpoint()
      println("[probe] wide corpus rows = " + wide.count())
      val cents = emb.orderBy($"vec_id").limit(pqK)
        .select((row_number().over(Window.orderBy($"vec_id")) - 1)
          .cast(LongType).as("cid"), $"embedding")
        .select($"cid", explode(expr(
          s"transform(sequence(0, ${pqM - 1}), sb -> struct(" +
            s"CAST(sb AS BIGINT) AS sub, " +
            s"slice(embedding, sb * $pqD + 1, $pqD) AS carr))")).as("z"))
        .select($"cid", $"z.sub".as("sub"), $"z.carr".as("carr"))
        .localCheckpoint()
      def assigned(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"vec_id", $"sub")
          .agg(min(struct($"d2", $"cid")).as("m"))
          .select($"vec_id", $"sub", $"m.cid".as("code"))
      time("PQ old xjoin") {
        assigned(wide.crossJoin(broadcast(cents))
          .withColumn("svec", expr(s"slice(embedding, sub * $pqD + 1, $pqD)"))
          .withColumn("d2", expr("l2q(svec, carr)")))
      }
      time("PQ new keyed") {
        assigned(wide.select($"vec_id", explode(expr(
            s"transform(sequence(0, ${pqM - 1}), sb -> struct(" +
              s"CAST(sb AS BIGINT) AS sub, " +
              s"slice(embedding, sb * $pqD + 1, $pqD) AS svec))")).as("z"))
          .select($"vec_id", $"z.sub".as("sub"), $"z.svec".as("svec"))
          .join(broadcast(cents), Seq("sub"))
          .withColumn("d2", expr("l2q(svec, carr)")))
      }
      spark.stop()
      return
    }

    // ---- kmAssign shape probe (round-20 verdict item 1, the
    // q103/q105 kernels): the shipped assignment crossJoins the
    // broadcast (cid, carr) table into |e|·k rows (the embedding
    // column copied k times) and argmins through a groupBy(vec_id)
    // exchange; the candidate shape folds the centroid ARRAY per row
    // with a higher-order aggregate — no row blow-up, no exchange,
    // but interpreted lambda evaluation. Equality + timing decide.
    if (args.length > 1 && args(1) == "km") {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select($"vec_id", $"embedding")
      val wide = (0 until 16).map(i =>
        emb.select(($"vec_id" + lit(i * 1000000L)).as("vec_id"),
          $"embedding")).reduce(_ unionAll _).localCheckpoint()
      val k = 32
      val cents = emb.orderBy($"vec_id").limit(k)
        .select((row_number().over(Window.orderBy($"vec_id")) - 1)
          .cast(LongType).as("cid"), $"embedding".as("carr"))
        .localCheckpoint()
      def oldAssign(e: org.apache.spark.sql.DataFrame) =
        e.crossJoin(broadcast(cents))
          .withColumn("d2", expr("l2q(embedding, carr)"))
          .groupBy($"vec_id")
          .agg(min(struct($"d2", $"cid")).as("m"))
          .select($"vec_id", $"m.cid".as("cid"), $"m.d2".as("d2"))
      val centArr = cents
        .agg(sort_array(collect_list(struct($"cid", $"carr"))).as("cs"))
      def newAssign(e: org.apache.spark.sql.DataFrame) =
        e.crossJoin(broadcast(centArr))
          .select($"vec_id", expr(
            "aggregate(cs, " +
              "struct(CAST(9223372036854775807 AS BIGINT) AS d2, " +
              "CAST(-1 AS BIGINT) AS cid), " +
              "(acc, c) -> least(acc, " +
              "struct(l2q(embedding, c.carr) AS d2, c.cid AS cid)))").as("m"))
          .select($"vec_id", $"m.cid".as("cid"), $"m.d2".as("d2"))
      val diff = oldAssign(wide).except(newAssign(wide)).count() +
        newAssign(wide).except(oldAssign(wide)).count()
      println(s"[probe] km old-vs-new assignment diff rows = $diff")
      time("KM old xjoin")(oldAssign(wide))
      time("KM new fold")(newAssign(wide))
      spark.stop()
      return
    }

    // ---- q102 final-plan probe: the shuffle_hash-hinted bucket
    // self-join's signature-once claim is a RUNTIME effect (AQE's
    // stage cache reuses canonically-identical exchanges when the
    // second stage is created, which a static explain cannot show).
    // Execute the declared query and print the FINAL adaptive plan so
    // the reuse is visible as a ReusedQueryStage/ShuffleQueryStage
    // sharing one stage id.
    if (args.length > 1 && args(1) == "q102") {
      val df = graft.SparkEntry.queries("q102_semantic_dedup")(spark, sfDir)
      df.queryExecution.toRdd.count()
      val fin = df.queryExecution.executedPlan.toString
      println("[probe] q102 FINAL adaptive plan:")
      println(fin)
      println("[probe] reused-stage markers: " +
        fin.linesIterator.count(l =>
          l.contains("ReusedQueryStage") || l.contains("ReusedExchange")))
      spark.stop()
      return
    }

    // decimal typing probe: the u8→money rescale path relies on
    // (30,0)/(9,0) → scale ≥ 8 exact and (34,0)/(5,0) → scale ≥ 4
    val dt = spark.range(1).select(
      (lit("1234549995").cast(DecimalType(30, 0)) /
        lit(100000000L).cast(DecimalType(9, 0))).as("a"),
      (lit("-1234544995").cast(DecimalType(30, 0)) /
        lit(100000000L).cast(DecimalType(9, 0))).as("b"),
      (lit("375123456789012").cast(DecimalType(34, 0)) /
        lit(10000L).cast(DecimalType(5, 0))).as("c"))
    println("[probe] division schema: " + dt.schema.map(_.dataType).mkString(", "))
    dt.show(false)
    dt.select(col("a").cast(DecimalType(18, 4)).as("a4"),
      col("b").cast(DecimalType(18, 4)).as("b4"),
      col("c").cast(DoubleType).as("cd")).show(false)
    println("[probe] DIV: " +
      spark.sql("SELECT 123456789 DIV 10000, -123456789 DIV 10000").collect().mkString)
    spark.stop()
  }
}
