package graft

import graft.functions.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkFixture {

  test("mergeOnce is greedy left-to-right, non-overlapping") {
    assert(Bpe.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Seq("l", "o", "w", "</w>"), "l", "o") == Seq("lo", "w", "</w>"))
    assert(Bpe.mergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }

  test("learns the hand-computed merges of a tiny corpus") {
    import spark.implicits._
    implicit val s = spark
    // corpus: low lower lowest -> (l,o) and (o,w) tie at 3, lex -> (l,o);
    // then (lo,w) at 3; then (low,e) at 2
    val docs = Seq("low lower lowest").toDF("text")
    val merges = Bpe.learnMerges(Bpe.wordTable(docs), 3)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("l", "o"), ("lo", "w"), ("low", "e")))
  }

  test("learns a deterministic vocabulary from the documents corpus") {
    implicit val s = spark
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Bpe.learnMerges(Bpe.wordTable(docs), 6)
    val b = Bpe.learnMerges(Bpe.wordTable(docs), 6)
    assert(a == b)
    assert(a.size == 6)
    assert(a.map(m => m.left + m.right).distinct.size == 6)
  }
}
