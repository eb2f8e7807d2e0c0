package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, SimHash64, SimHash64Funcs}

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: bit b of simhash tests hex digit b/4 of
    * md5(word), nibble mask 8 >> (b%4) — the SQL oracle tower's convention. */
  private def refSimhash(words: Seq[String]): Long = {
    val cnt = new Array[Int](64)
    words.distinct.foreach { w =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      for (b <- 0 until 64) {
        val nib = Integer.parseInt(hex(b / 4).toString, 16)
        if ((nib & (8 >> (b % 4))) > 0) cnt(b) += 1 else cnt(b) -= 1
      }
    }
    (0 until 64).foldLeft(0L)((r, b) => if (cnt(b) > 0) r | (1L << b) else r)
  }

  test("simhash64 == hex-digit reference; codegen == interpreted") {
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "einzelnes wort",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "dup dup dup dup") // in-doc dups must not double-vote
    val got = docs.toDF("text")
      .select(F.expr("simhash64(array_distinct(filter(split(text, ' '), w -> w <> '')))").as("h"))
      .collect().map(_.getLong(0))
    val want = docs.map(t => refSimhash(t.split(" ").filter(_.nonEmpty).toSeq))
    assert(got.toSeq == want)
    // interpreted eval agrees with codegen path
    docs.foreach { t =>
      val words = t.split(" ").filter(_.nonEmpty).distinct
      val arr = ArrayData.toArrayData(words.map(UTF8String.fromString))
      val interp = SimHash64(Literal.create(arr, ArrayType(StringType))).eval(null)
      assert(interp == refSimhash(words.toSeq))
    }
  }

  test("simhash64 stays inside whole-stage codegen; empty -> 0; null -> null") {
    GraftFunctions.register(spark)
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.expr("simhash64(array_distinct(split(text, ' ')))").as("h"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"), plan)
      assert(df.collect().length == 500) // throws if codegen failed to compile
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    val edge = Seq((Some(Seq.empty[String]), 1), (None, 2)).toDF("a", "i")
      .select(F.expr("simhash64(a)").as("h")).collect()
    assert(edge(0).getLong(0) == 0L)
    assert(edge(1).isNullAt(0))
  }

  test("near-identical docs land within small Hamming distance") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi".split(" ").toSeq
    val b = a.updated(3, "CHANGED") // one word differs
    val ha = refSimhash(a)
    val hb = refSimhash(b)
    val hamming = java.lang.Long.bitCount(ha ^ hb)
    assert(hamming <= 16, s"hamming $hamming unexpectedly large")
    assert(java.lang.Long.bitCount(ha ^ refSimhash(a.reverse)) == 0,
      "word order must not matter")
  }
}
