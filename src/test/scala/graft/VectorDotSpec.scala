package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.GraftFunctions

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  test("vector_dot == zip_with/aggregate fold, bitwise, on real embeddings") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(F.col("vec_id"), F.col("embedding").as("v"))
    val a = emb.select(F.col("vec_id").as("ia"), F.col("v").as("va")).where(F.col("ia") < 30)
    val b = emb.select(F.col("vec_id").as("ib"), F.col("v").as("vb")).where(F.col("ib") < 30)
    val both = a.crossJoin(b).select(
      F.col("ia"), F.col("ib"),
      F.expr("vector_dot(va, vb)").as("fast"),
      F.expr("aggregate(zip_with(transform(va, x -> cast(x as double)), " +
        "transform(vb, x -> cast(x as double)), (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("ref"))
    val rows = both.collect()
    assert(rows.length == 900)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"(${r.getLong(0)},${r.getLong(1)}): ${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("vector_dot stays inside whole-stage codegen (no fallback)") {
    GraftFunctions.register(spark)
    // non-foldable input (parquet scan) so the projection actually codegens.
    // NOTE: the zip_with/aggregate HOF alternative is CodegenFallback and
    // would knock the whole projection out of WSCG — that asymmetry is the
    // point of having a native Expression.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(F.expr("vector_dot(embedding, embedding)").as("d"))
    val ref = emb.select(
      F.expr("aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x)").as("ref"))
    val rows = df.collect().map(_.getDouble(0))
    val refs = ref.collect().map(_.getDouble(0))
    assert(rows.length == 500)
    rows.zip(refs).foreach { case (a, b) => assert(a == b) }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"), plan)
    val hofPlan = ref.queryExecution.executedPlan.toString
    assert(!hofPlan.contains("*(1) Project"),
      s"HOF projection unexpectedly codegens now — revisit the note above:\n$hofPlan")
    // interpreted path agrees (eval vs codegen)
    val interp = graft.functions.VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0f, 4.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))).eval(null)
    assert(interp == 11.0)
  }

  test("multiple vector_dot instances in ONE projection stay compiled (no Janino redefinition)") {
    GraftFunctions.register(spark)
    // Regression for the round-1 defect: doGenCode emitted fixed local names
    // n/acc/i, so >=2 instances in one generated projection hit Janino
    // "Redefinition of local variable" and the whole stage silently fell
    // back to interpreted eval. With spark.sql.codegen.fallback=false a
    // compile error THROWS instead of falling back, so this test fails
    // loudly if the collision ever returns.
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(F.col("vec_id"), F.col("embedding").as("v"))
      // inline-cosine shape: three dots over the same projection
      val df = emb.select(
        F.expr("vector_dot(v, v)").as("vv"),
        F.expr("vector_dot(v, slice(v, 1, 8))").as("vh"),
        F.expr("vector_dot(slice(v, 1, 8), slice(v, 1, 8))").as("hh"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"), plan)
      val rows = df.collect()
      assert(rows.length == 500)
      // values agree with the interpreted HOF reference
      val ref = emb.select(
        F.expr("aggregate(transform(v, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x)").as("vv"),
        // vector_dot is min-length; zip_with null-pads — slice both sides
        F.expr("aggregate(zip_with(transform(slice(v, 1, 8), x -> cast(x as double)), transform(slice(v, 1, 8), x -> cast(x as double)), (x, y) -> x * y), 0D, (acc, x) -> acc + x)").as("vh"),
        F.expr("aggregate(transform(slice(v, 1, 8), x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x)").as("hh")
      ).collect()
      rows.zip(ref).foreach { case (a, b) =>
        assert(a.getDouble(0) == b.getDouble(0))
        assert(a.getDouble(1) == b.getDouble(1))
        assert(a.getDouble(2) == b.getDouble(2))
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("null array -> null; mismatched lengths -> min-length semantics") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 1.0f, 1.0f)), Some(Array(2.0f, 2.0f))),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b").select(F.expr("vector_dot(a, b)").as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(0) == 4.0)
    assert(got(1) == null)
  }
}
