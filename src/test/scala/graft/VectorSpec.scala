package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression must be bit-identical to the HOF
  * reference formulation on real embedding data (both float inputs and
  * derived double arrays), and satisfy basic vector-algebra laws.
  */
class VectorSpec extends AnyFunSuite with SparkFixture {

  private lazy val emb =
    Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("native dot == HOF dot, float inputs (bit-identical)") {
    val n = emb.select(
        Vectors.dot(col("embedding"), col("embedding")).as("a"),
        Vectors.dotHof(Vectors.toDouble(col("embedding")), Vectors.toDouble(col("embedding"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("native dot == HOF dot on double arrays across pairs") {
    val e = emb.select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val pairs = e.filter(col("vec_id") < 30).crossJoin(
      e.filter(col("vec_id") >= 30 && col("vec_id") < 60)
        .select(col("v").as("w")))
    val n = pairs.select(
        Vectors.dot(col("v"), col("w")).as("a"),
        Vectors.dotHof(col("v"), col("w")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("native dot matches HOF null semantics on ragged arrays") {
    import org.apache.spark.sql.functions.{array, lit}
    val df = spark.range(1).select(
      Vectors.dot(array(lit(1.0), lit(2.0)), array(lit(3.0))).as("a"),
      Vectors.dotHof(array(lit(1.0), lit(2.0)), array(lit(3.0))).as("b"))
    val row = df.first()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("embeddings are L2-normalized: self-dot ~ 1") {
    val bad = emb.select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
      .filter(abs(col("d") - 1.0) > 1e-5).count()
    assert(bad == 0)
  }

  test("cosine is symmetric") {
    val e = emb.limit(20).select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("i"), col("v").as("vi"))
    val b = e.select(col("vec_id").as("j"), col("v").as("vj"))
    val n = a.crossJoin(b)
      .select(Vectors.cosine(col("vi"), col("vj")).as("x"),
        Vectors.cosine(col("vj"), col("vi")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }
}
