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
