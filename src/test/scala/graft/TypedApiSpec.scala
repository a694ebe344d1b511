package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** Coverage for the declared typed lanes (SURVEY §2B UDF surface):
  * scalar Scala UDFs (the slow-lane escape hatch — a custom Expression is
  * always preferred, see functions.DotF) and case-class Dataset[T]
  * transformations. */
case class Li(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed Scala UDF matches the built-in expression it shadows") {
    // a UDF is opaque to Catalyst (no codegen, no pushdown through it) —
    // registered here only to prove the lane works; production code uses
    // built-ins or graft's custom Expressions
    val tokCount = udf((s: String) => s.split(" ").length)
    spark.udf.register("tok_count_udf", tokCount)
    val df = graft.core.Tables.documents(spark, sf001)
      .select(
        tokCount($"text").as("via_udf"),
        size(split($"text", " ")).as("via_builtin"))
    assert(df.filter($"via_udf" =!= $"via_builtin").count() === 0)
    // and via SQL registration
    val n = spark.sql(s"SELECT tok_count_udf('a b c') AS n").as[Int].head()
    assert(n === 3)
  }

  test("Dataset[T] typed pipeline: filter/map/groupByKey agg") {
    val ds = graft.core.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag")
      .as[Li]
    val byFlag = ds
      .filter(_.l_quantity > 10)
      .map(li => li.copy(l_quantity = li.l_quantity * 2))
      .groupByKey(_.l_returnflag)
      .mapValues(_.l_quantity.toLong)
      .reduceGroups(_ + _)
      .collect().toMap
    // cross-check against the untyped plan
    val expected = graft.core.Tables.lineitem(spark, sf001)
      .filter($"l_quantity" > 10)
      .groupBy($"l_returnflag")
      .agg(sum(($"l_quantity" * 2).cast("long")).as("s"))
      .as[(String, Long)].collect().toMap
    // typed path truncates per-row (toLong after doubling); compare on the
    // same truncation
    val expected2 = graft.core.Tables.lineitem(spark, sf001)
      .filter($"l_quantity" > 10)
      .select($"l_returnflag", ($"l_quantity" * 2).cast("long").as("q"))
      .groupBy($"l_returnflag").agg(sum($"q"))
      .as[(String, Long)].collect().toMap
    assert(byFlag === expected2)
  }

  test("typed cogroup reconciles both sides per key, matching the join-based plan") {
    // cogroup = the typed reconciliation shape: both sides shuffle ONCE on
    // the key, then one function sees each key's rows from both sides —
    // the escape hatch when per-key merge logic won't express as a join
    // (here it would, which is what makes it checkable)
    val orders = graft.core.Tables.orders(spark, sf001)
      .select($"o_orderkey", $"o_totalprice".cast("double").as("p"))
      .as[(Long, Double)].groupByKey(_._1)
    val items = graft.core.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_quantity".cast("double").as("q"))
      .as[(Long, Double)].groupByKey(_._1)
    val recon = orders.cogroup(items) { (k, os, ls) =>
      val lis = ls.toSeq
      // orders without items and items without orders both surface — the
      // reconciliation property an inner join silently drops
      Iterator.single((k, os.nonEmpty, lis.length.toLong))
    }.collect().map { case (k, hasO, nLi) => k -> ((hasO, nLi)) }.toMap
    val expected = graft.core.Tables.orders(spark, sf001)
      .select($"o_orderkey".as("k")).distinct()
      .join(graft.core.Tables.lineitem(spark, sf001)
          .groupBy($"l_orderkey".as("k")).agg(count(lit(1)).as("n")),
        Seq("k"), "full_outer")
      .select($"k", $"n").as[(Long, Option[Long])].collect()
      .map { case (k, n) => k -> n }.toMap
    assert(recon.size === expected.size)
    expected.foreach { case (k, nOpt) =>
      val (hasO, nLi) = recon(k)
      assert(nLi === nOpt.getOrElse(0L), s"order $k item count")
      assert(hasO, s"order $k should be present on the orders side")
    }
  }
}
