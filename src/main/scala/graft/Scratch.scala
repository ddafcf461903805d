package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: prints the formatted plan and stage timings
  * for one named query. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "ngram_profile") {
      // phase breakdown for the suite's slowest query
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      val d = operators.DedupQueries.withPlants(spark, sfDir)
      t("docs scan")(d.count())
      def explodedRaw = d
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("sh"))
      def explodedMd5 = d
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(toks) - 3), i -> ${operators.Ql.md5PrefixLong("concat_ws(' ', slice(toks, i + 1, 3))", 14)})")).as("sh"))
      def explodedThenMd5 = d
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("sh0"))
        .select(col("doc_id"), expr(operators.Ql.md5PrefixLong("sh0", 14)).as("sh"))
      t("explode raw (warm)")(explodedRaw.count())
      t("explode raw")(explodedRaw.count())
      t("explode md5-in-lambda")(explodedMd5.count())
      t("explode md5-in-lambda 2")(explodedMd5.count())
      t("explode then md5")(explodedThenMd5.count())
      t("explode then md5 2")(explodedThenMd5.count())
      t("md5 distinct")(explodedThenMd5.distinct().count())
      val full = SparkEntry.queries("q_dedup_ngram_jaccard")
      t("full query cold")(full(spark, sfDir).count())
      spark.catalog.clearCache()
      t("full query cold 2")(full(spark, sfDir).count())
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run $i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
