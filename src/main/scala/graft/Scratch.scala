package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: prints the formatted plan and stage timings
  * for one named query. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "clusters_profile") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      for (iter <- 1 to 2) {
        val full = SparkEntry.queries("q_dedup_clusters")
        t(s"full query $iter")(full(spark, sfDir).count())
        spark.catalog.clearCache()
      }
      // phase breakdown: edge build vs CC loop
      val planted = operators.DedupQueries.withPlants(spark, sfDir)
      t("docs scan")(planted.count())
      val psh = planted
        .withColumn("toks", expr("slice(split(text, ' '), 1, 12)"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("sh0"))
        .select(col("doc_id"), expr(operators.Ql.md5PrefixLong("sh0", 14)).as("sh"))
        .distinct()
      t("psh distinct")(psh.count())
      val hotTab = psh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select("sh")
      val rare = psh.join(broadcast(hotTab), Seq("sh"), "left_anti")
      val e = rare.select(col("sh"), col("doc_id").as("d1"))
        .join(rare.select(col("sh"), col("doc_id").as("d2")), "sh")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("common"))
        .filter(col("common") >= 2)
        .select("d1", "d2").cache()
      val ne = t("edges build+count")(e.count())
      println(s"[profile] edges = $ne")
      val adj = e.select(col("d1").as("a"), col("d2").as("b"))
        .unionByName(e.select(col("d2").as("a"), col("d1").as("b")))
        .repartition(1).cache()
      val (labels, rounds) = t("cc loop")(
        operators.ClusterQueries.connectedComponents(adj))
      println(s"[profile] rounds = $rounds")
      t("final agg")(labels.groupBy("lbl").count().count())
      spark.stop(); return
    }
    if (name == "contam_hygiene") {
      // r15 verdict #3: itemize how much of the contamination family's
      // r14→r15 drift is the deliberate in-query cache
      // materialize+release hygiene (localCheckpoint of the report +
      // unpersist of the shingle cache INSIDE the timed window) vs
      // ambient/plan changes. Times the SHIPPED queries against pinned
      // twins that skip both hygiene steps (the r14 shape: cache left
      // for the bench loop's clearCache to collect).
      // PINNED-TWIN PROVENANCE (r16 ADVICE): the twin bodies below are
      // copies of the q_contamination / q_decontam_scrub query bodies as
      // of round 16, commit 96ffb16 (PipelineQueries.scala:187, :225 at
      // that commit), minus the two hygiene steps. If the shipped queries
      // change shape, re-copy the bodies here (diff against that commit)
      // or this probe stops measuring the hygiene delta it claims to.
      import org.apache.spark.sql.functions._
      def t(label: String)(f: => Any): Double = {
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[hygiene] $label%-32s $dt%6.2f s"); dt
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      def run(label: String)(f: => Any): Double = {
        val xs = (1 to 3).map { i => val d = t(s"$label $i")(f); spark.catalog.clearCache(); d }
        println(f"[hygiene] $label MEDIAN ${med(xs)}%6.2f s"); med(xs)
      }
      // warm codegen once each, untimed
      SparkEntry.queries("q_contamination")(spark, sfDir).count(); spark.catalog.clearCache()
      SparkEntry.queries("q_decontam_scrub")(spark, sfDir).count(); spark.catalog.clearCache()
      run("q_contamination shipped")(
        SparkEntry.queries("q_contamination")(spark, sfDir).count())
      run("q_contamination pinned") {
        val docs = operators.PipelineQueries
          .contamShingles(Tables.documents(spark, sfDir), "lang").cache()
        val trainSh = docs.filter(col("b") < 90).select("sh").distinct()
        val testSh = docs.filter(col("b") >= 90)
        val hits = testSh.join(trainSh, "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        testSh.select("doc_id", "lang").distinct()
          .join(hits, Seq("doc_id"), "left")
          .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_test"),
            sum((col("n_hits") > 0).cast("long")).as("n_contaminated"),
            sum(col("n_hits")).as("n_hit_shingles"))
          .count()
      }
      run("q_decontam_scrub shipped")(
        SparkEntry.queries("q_decontam_scrub")(spark, sfDir).count())
      run("q_decontam_scrub pinned") {
        val sh = operators.PipelineQueries
          .contamShingles(Tables.documents(spark, sfDir), "lang").cache()
        val trainSh = sh.filter(col("b") < 90)
        val testSh = sh.filter(col("b") >= 90)
        val testSet = testSh.select("sh").distinct()
        val trainSize = trainSh.groupBy("doc_id", "lang").agg(count(lit(1)).as("n_sh"))
        val trainHits = trainSh.join(testSet, "sh")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        val scrubbed = trainSize.join(trainHits, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_hits"))
          .withColumn("removed", expr("2 * n_hits >= n_sh")).cache()
        val keptSet = trainSh.join(
            scrubbed.filter(col("removed")).select("doc_id"), Seq("doc_id"), "left_anti")
          .select("sh").distinct()
        val trainSet = trainSh.select("sh").distinct()
        def contamOf(set: org.apache.spark.sql.DataFrame, nm: String) =
          testSh.join(set, "sh").select("doc_id", "lang").distinct()
            .groupBy("lang").agg(count(lit(1)).as(nm))
        scrubbed.groupBy("lang").agg(
            count(lit(1)).as("n_train"),
            sum(col("removed").cast("long")).as("n_scrubbed"))
          .join(testSh.select("doc_id", "lang").distinct()
            .groupBy("lang").agg(count(lit(1)).as("n_test0")), Seq("lang"), "left")
          .join(contamOf(trainSet, "b0"), Seq("lang"), "left")
          .join(contamOf(keptSet, "a0"), Seq("lang"), "left")
          .count()
      }
      spark.stop(); return
    }
    if (name == "window_audit") {
      // enumerate every query whose physical plan contains an
      // unpartitioned Window node, with the node's child — feeds the
      // PlanSpec single-partition-window whitelist
      import org.apache.spark.sql.execution.window.WindowExec
      SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
        try {
          val df = SparkEntry.queries(q)(spark, sfDir)
          val hits = df.queryExecution.sparkPlan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          hits.foreach { w =>
            println(s"[winaudit] $q :: ${w.child.simpleStringWithNodeId().take(160)}")
          }
        } catch { case ex: Throwable => println(s"[winaudit] $q ERROR ${ex.getMessage.take(120)}") }
      }
      spark.stop(); return
    }
    if (name == "jpeg_probe") {
      // measure the dHash hamming distribution for quality-q JPEG
      // re-encodes vs their PNG originals, and cross-image distances,
      // before pinning MultimodalSpec assertions (r16 verdict #3)
      import graft.multimodal.JdkMedia
      for (q <- Seq(0.5f, 0.7f, 0.9f)) {
        val pairs = (0L until 50L).map { id =>
          JdkMedia.hamming(JdkMedia.dHash(JdkMedia.pngPayload(id)),
            JdkMedia.dHash(JdkMedia.jpegPayload(id, q)))
        }
        println(s"[jpeg] q=$q pair dists: min=${pairs.min} max=${pairs.max} " +
          s"median=${pairs.sorted.apply(25)} all=${pairs.mkString(",")}")
      }
      val hashes = (0L until 50L).map(id => JdkMedia.dHash(JdkMedia.pngPayload(id)))
      val cross = for (i <- 0 until 50; j <- i + 1 until 50)
        yield JdkMedia.hamming(hashes(i), hashes(j))
      println(s"[jpeg] cross dists: min=${cross.min} max=${cross.max} " +
        s"median=${cross.sorted.apply(cross.size / 2)}")
      // does the lossy re-encode change pixel sums (defeats sum-dedup)?
      val sumsEq = (0L until 50L).count { id =>
        val a = JdkMedia.decodeImage(id, JdkMedia.pngPayload(id))
        val jb = JdkMedia.jpegPayload(id, 0.7f)
        val b = JdkMedia.decodeImage(id, jb)
        (a.sum_r, a.sum_g, a.sum_b) == (b.sum_r, b.sum_g, b.sum_b)
      }
      println(s"[jpeg] q=0.7 pixel-sum-identical count (of 50): $sumsEq")
      // nearest-original identification: is each re-encode's closest
      // original (by hamming) its own?
      for (q <- Seq(0.7f, 0.9f)) {
        val correct = (0L until 50L).count { id =>
          val jh = JdkMedia.dHash(JdkMedia.jpegPayload(id, q))
          val own = JdkMedia.hamming(jh, hashes(id.toInt))
          val others = (0 until 50).filter(_ != id).map(j => JdkMedia.hamming(jh, hashes(j)))
          own < others.min
        }
        println(s"[jpeg] q=$q nearest-original strictly-correct: $correct / 50")
      }
      spark.stop(); return
    }
    if (name == "pr_cadence") {
      // r16 verdict #5: measure checkpoint cadence 4 vs 8 on the 8-round
      // q_pagerank loop (cadence 8 = no mid-loop barrier; AQE fuses all
      // rounds into the final materialization). Same edge build as the
      // shipped query; result row count is identical by construction
      // (the cadence only moves barriers, never values).
      import org.apache.spark.sql.functions._
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      def edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      // warm codegen/scan once, untimed
      operators.GraphQueries.pageRank(edges, 8, 4).count()
      for (cadence <- Seq(4, 8, 4, 8)) {
        val xs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          operators.GraphQueries.pageRank(edges, 8, cadence)
            .orderBy(col("pr").desc, col("node")).limit(20).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[cadence] cadence=$cadence runs=${xs.map(x => f"$x%.2f").mkString(",")} " +
          f"median=${med(xs)}%.2f s")
      }
      spark.stop(); return
    }
    if (name.startsWith("fullq:")) {
      // construction-INCLUSIVE timing: composite queries run their eager
      // checkpoints while the frame is built, which the generic mode's
      // per-run loop never sees
      val q = name.stripPrefix("fullq:")
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        println(f"[fullq] $q run $i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (name == "copart_check") {
      // does localCheckpoint preserve hash partitioning, and does the
      // per-round pagerank join skip the edge-side exchange?
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      val edges0 = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val edges = org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointPartitionedBy(edges0, Seq("src"))
      val deg = org.apache.spark.sql.graftbridge.CheckpointBridge
        .localCheckpointPartitionedBy(
          edges.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
      val ranks = deg.select(col("src").as("node"), lit(1.0).as("pr"))
      val wt = ranks.join(deg.hint("shuffle_hash"), ranks("node") === deg("src"))
        .select(col("src"), (col("pr") / col("d")).as("w"))
      val round = edges.join(wt.hint("shuffle_hash"), "src").groupBy(col("dst"))
        .agg(sum(col("w")).as("s"))
      round.explain("formatted")
      spark.stop(); return
    }
    if (name == "pr_profile") {
      import org.apache.spark.sql.functions._
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      for (i <- 1 to 2) t(s"full $i")(SparkEntry.queries("q_pagerank")(spark, sfDir).count())
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val e2 = t("edges build+ckpt")(edges.localCheckpoint(true))
      t("deg")(e2.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint(true))
      spark.stop(); return
    }
    if (name == "q2_profile") {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      val cost = Tables.lineitem(spark, sfDir)
      cost.createOrReplaceTempView("v_lineitem_q2")
      val agg = spark.sql("""
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supply_cost
        FROM v_lineitem_q2 GROUP BY 1, 2""")
      t("agg count (no ckpt)")(agg.count())
      t("agg localCheckpoint")(agg.localCheckpoint(true))
      for (i <- 1 to 2)
        t(s"full query $i")(SparkEntry.queries("q_tpch_q2_shape")(spark, sfDir).count())
      spark.stop(); return
    }
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
