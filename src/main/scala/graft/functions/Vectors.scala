package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (no UDFs — stays inside
  * whole-stage codegen).
  *
  * Everything casts to double FIRST and folds sequentially so the result is
  * bit-identical to the DuckDB oracle's list arithmetic.
  */
object Vectors {

  /** Elementwise cast to array<double>. */
  def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product. Native codegen Expression (DotProduct) — bit-identical
    * to the HOF reference formulation [[dotHof]] but ~10× faster in
    * pair-scoring loops.
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Reference HOF formulation of [[dot]] (kept for the equivalence spec:
    * both must produce identical doubles).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity (full formula — callers on L2-normalized data can
    * use [[dot]] directly, which is the 100 TB fast path).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))
}
