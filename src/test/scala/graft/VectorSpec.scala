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

  test("q_dedup_embed LSH banding finds the exact brute-force pair set") {
    // ground truth: brute-force all-pairs cosine > 0.9 over the same
    // planted table — the banded candidate path must lose no pair (the
    // plants agree on every band, so recall here must be exactly 1)
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val planted = e.unionByName(
      e.filter(col("vec_id") < 10).select(
        (col("vec_id") + 100000).as("vec_id"),
        expr("concat(slice(v, 1, 63), array(element_at(v, 64) + 0.1d))").as("v")))
    val normed = planted.withColumn("norm", sqrt(Vectors.normSq(col("v"))))
    val brute = normed.select(col("vec_id").as("d1"), col("v").as("v1"), col("norm").as("n1"))
      .crossJoin(normed.select(col("vec_id").as("d2"), col("v").as("v2"), col("norm").as("n2")))
      .filter(col("d1") < col("d2"))
      .withColumn("cos", Vectors.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") > 0.9)
      .select("d1", "d2")
    val banded = SparkEntry.queries("q_dedup_embed")(spark, sf).select("d1", "d2")
    assert(brute.exceptAll(banded).count() == 0, "banded path missed a true pair")
    assert(banded.exceptAll(brute).count() == 0, "banded path emitted a false pair")
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
