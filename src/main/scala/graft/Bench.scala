package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the NTZ→LTZ events normalization (Tables.normalizeEventTs) is only
      // value-preserving under a UTC session zone — pin it like Verify does
      .config("spark.sql.session.timeZone", "UTC")
      // AQE stays on (the at-scale configuration); knob for measuring its
      // small-data planning overhead locally
      .config("spark.sql.adaptive.enabled", {
        val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true").toLowerCase
        require(aqe == "true" || aqe == "false", s"SPARK_GRAFT_AQE must be true|false, got $aqe")
        aqe
      })
      .config("spark.ui.enabled", "false")
      // 92+ back-to-back queries in one 8g JVM: bound the status-store and
      // generated-class retention so late queries aren't taxed by the early
      // ones' metadata (the r2 bench showed mid-run queries at 10-20× their
      // isolated time from exactly this kind of accumulated pressure)
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      // janino cache defaults to 100 classes — the suite compiles far more;
      // evicted+recompiled plans churn the code cache mid-run
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (Hadoop FS init, parquet footer reads, codegen/
    // janino warmup) so fixed JVM startup cost isn't attributed to whichever
    // query happens to run first.
    Tables.all.foreach { t =>
      // events needs the nanos-timestamp loader — a raw read throws
      try {
        if (t == "events") Tables.events(spark, sfDir).count()
        else Tables.table(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    // Codegen/executor warmup: one representative query per major operator
    // family, untimed, at the smallest SF (generated code depends on the
    // schema, not the data volume — identical classes get compiled). This
    // moves the shared janino / broadcast-exchange / window-exec first-use
    // cost out of whichever timed query would otherwise pay it.
    // warm against the smallest sibling SF of the bench dir so the cost is
    // negligible; fall back to the bench dir itself (still outside timers)
    // sf0.001, deliberately: warming at sf0.01 was tried (r6) and made the
    // suite WORSE (69.0 s vs 62.4 s, canary 3.3×) — the 10× warm corpus
    // leaves broadcast/GC debris that the first timed queries then pay
    // for. The tiny corpus compiles the same generated classes at
    // negligible cost; repeated passes (below) supply the invocation
    // counts HotSpot's C2 wants.
    val warmSf = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.toString else sfDir
    }
    System.err.println(s"[bench] codegen warmup against $warmSf")
    val lightWarm = Seq("q_agg_pricing_summary", "q_join_inner", "q_win_rank",
      "q_sort_limit", "q_misc_stack", "q_explode_tokens", "q_agg_pivot")
    // dedup/text family: the shingle-explode + md5 + band/posting-join
    // plans are the suite's largest codegen units (~2.7s first-use for
    // q_dedup_ngram_jaccard alone); the iterative jobs (CC label
    // propagation, BPE, Lloyd) recompile a same-shaped plan every round.
    // These only warm when a tiny sibling SF exists — at full bench scale
    // they'd add ~25s of heavy untimed work, not a cheap compile pass.
    val heavyWarm =
      if (warmSf == sfDir) Seq.empty
      else Seq("q_dedup_ngram_jaccard", "q_dedup_minhash", "q_fuzzy_join",
        "q_dedup_clusters", "q_bpe_merges", "q_kmeans",
        // r5 additions whose first-use codegen dominates their in-loop
        // time (double-EXISTS decorrelation, shared-CTE min, 5-gram
        // contamination index, segment-dedup hash joins)
        "q_contamination", "q_tpch_q21_shape", "q_tpch_q2_shape",
        "q_segment_dedup",
        // r6 additions: 10-round PageRank (iterative, per-round codegen)
        // and the SemDeDup cluster-pair pass
        "q_pagerank", "q_semantic_dedup",
        // r6 second batch: shingle-index containment, oriented triangle
        // wedge join, ordinal-join sorted neighborhood, CMS build+probe
        "q_containment", "q_triangle_count", "q_dedup_sorted_neighborhood",
        "q_cms_heavy", "q_bloom_decontam",
        // recursive CTE: each level is its own job + codegen unit
        "q_sql_recursive",
        // Apriori level-3: the triple join + 3 semi-joins dominate cold
        "q_itemsets3",
        // r7 additions: 3-round HITS (iterative, per-round codegen like
        // pagerank — 6.7 s first vs 4.6 s steady in r7 measurement) and
        // the corpus-wide 5-gram inverted index
        "q_hits", "q_dup_gram_coverage",
        // r8: runs BOTH corpus dedup pipelines (exact Jaccard truth +
        // LSH candidates) — 6.3 s first vs 5.4 s steady at sf0.1
        "q_dedup_recall",
        // r8 second session: iterative Bellman-Ford (per-round codegen,
        // pagerank family) and the deg≤50 wedge join
        "q_sssp", "q_link_pred",
        // r12: both run the full exact-Jaccard + LSH candidate stack
        // (the q_dedup_recall cost family)
        "q_dedup_threshold_sweep", "q_lsh_banding_planner",
        // r13: the LSH curation chain runs the minhash banding over the
        // whole deduped corpus (q_dedup_minhash cost family); stratified
        // capture-recapture runs TWO hash-family passes plus the exact
        // scorer (the q_capture_recapture + q_dedup_recall cost family)
        "q_curation_pipeline_lsh", "q_capture_recapture_stratified",
        // r13: runs the full edge-build + CC loop (q_dedup_clusters family)
        "q_dedup_cluster_profile",
        // r14: both run the LSH band pipeline + a CC loop over the
        // candidate graph (q_dedup_minhash + q_dedup_clusters families)
        "q_split_safe", "q_split_safe_leakage",
        // r15: the safe curation chain runs gate+dedup+banding+CC (the
        // q_split_safe cost family); the leakage re-audit runs the chain
        // PLUS a second banding pass over the kept docs; the n-gram sweep
        // runs THREE shingle explode+distinct passes (q_contamination x3)
        "q_curation_pipeline_safe", "q_curation_safe_leakage",
        "q_contam_ngram_sweep",
        // r15 second wave: runs the prefix-shingle edge build + CC loop
        // plus the member-vs-canonical scoring (q_dedup_clusters family)
        "q_dedup_chain_risk",
        // r15 third wave: the first two run the edge build + CC loop over
        // the planted corpus (q_dedup_clusters family); the scrub runs
        // the corpus-wide segment explode + keep-first window
        "q_softdedup_weights", "q_dedup_keep_policy", "q_segment_dedup_scrub",
        // runs BOTH curation chains (incl. the LSH banding pass)
        "q_chain_agreement",
        // r16 (ADVICE r15): the remaining full-shingle/CC newcomers —
        // the cascade runs exact dedup + the LSH+CC stack; attribution
        // and run-length each run a corpus-wide gram explode + hash
        // join; dup-locality runs the banding + CC + shard-pack chain
        "q_dedup_cascade", "q_contam_attribution", "q_contam_run_length",
        "q_shard_dup_locality",
        // r16 second wave: runs the full exact-Jaccard + LSH candidate
        // stack over the planted cross-split corpus (q_dedup_recall
        // cost family)
        "q_contam_neardup")
    (lightWarm ++ heavyWarm)
      .filter(SparkEntry.queries.contains)
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmSf).count()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    // One untimed steady-state pass of the heavy family AT BENCH SCALE:
    // AQE picks different physical plans at sf0.1 than at the tiny warm
    // SF (broadcast vs shuffle joins), so the sf0.001 pass compiles the
    // WRONG generated classes for these and the first timed run would pay
    // full-scale codegen + C2 promotion that no later run repeats — that
    // same-query cold-vs-warm gap, not cross-query interference, was the
    // whole remaining first-vs-rerun canary gap in r5/r6 (1.3×: e.g.
    // ngram-jaccard 4.45 s first vs 2.84 s steady). After this pass the
    // timed loop measures steady-state latency for every query uniformly.
    if (warmSf != sfDir)
      heavyWarm.filter(SparkEntry.queries.contains).foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()
    System.gc() // settle warmup debris before anything is timed
    // optional comma-separated subset for local profiling, e.g.
    // SPARK_GRAFT_BENCH_ONLY=q_dedup_embed,q_fingerprint
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(SparkEntry.queries.keySet)
    val unknown = only -- SparkEntry.queries.keySet
    if (unknown.nonEmpty)
      System.err.println(s"[bench] WARNING: unknown query names ignored: ${unknown.mkString(",")}")
    val failed = scala.collection.mutable.ListBuffer[String]()
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapUsedMb: Long =
      (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) >> 20
    // Between queries: drop caches AND force a full GC. The GC matters
    // beyond hygiene — ContextCleaner reclaims dead broadcast blocks and
    // shuffle state only when their weak refs are collected, so without it
    // ~90 queries' broadcasts pile up in the 8g heap and mid-run queries
    // pay 10-20× their isolated time in GC stalls (the r2 q_dead_letter
    // 23.8 s-vs-1.03 s anomaly). Runs OUTSIDE the timed window.
    val interGc = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "true").toBoolean
    var gcInQueries = 0L
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        recordFailure: Boolean): Double = {
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          if (recordFailure) failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val gcDt = gcMillis - gc0
      gcInQueries += gcDt
      spark.catalog.clearCache()
      if (interGc) System.gc()
      System.err.println(
        f"[bench] $name%-28s $dt%7.2f s  gc=$gcDt%4d ms  heap=${heapUsedMb}%5d MB")
      dt
    }
    // Streaming throughput: replay the events table through the
    // watermarked tumbling-window job (the reference's core workload —
    // stream in, windowed counters out) and report rows/sec end-to-end
    // (source listing, watermark tracking, state store, no-op sink).
    // Runs BEFORE the 92-query loop: in r3 it ran last and measured the
    // loop's leftover JVM pressure (6.1k rows/s vs 14.4k fresh), not the
    // streaming job.
    // steady-set batch statistics shared by the headline job and the
    // per-processor runs: drop the first batch (codegen + state-store
    // init) and trailing empty finalizer batches; median per-batch rate
    // is robust to one slow outlier batch (GC pause, compaction)
    def steadyStats(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Long, Double, Double) = {
      val steady = q.recentProgress.drop(1).filter(_.numInputRows > 0)
      val rows = steady.map(_.numInputRows).sum
      val procSec = steady
        .flatMap(p => Option(p.durationMs.get("triggerExecution")))
        .map(_.toLong).sum / 1e3
      val perBatch = steady.flatMap { p =>
        Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).filter(_ > 0)
          .map(ms => p.numInputRows.toDouble * 1e3 / ms)
      }.sorted
      val medianEps =
        if (perBatch.isEmpty) 0.0
        else if (perBatch.length % 2 == 1) perBatch(perBatch.length / 2)
        else (perBatch(perBatch.length / 2 - 1) + perBatch(perBatch.length / 2)) / 2
      (rows, procSec, medianEps)
    }
    val (streamRows, streamSec, streamMedianEps, stagedIn) = try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_bench_ckpt").toString
      // Stage the events table as 8 TIME-SLICED files arriving in event-
      // time order (8 files × maxFilesPerTrigger=1 = 8 micro-batches).
      // Slicing by time matters: replaying the SAME rows per batch would
      // advance the watermark past them and measure the drop path, not
      // the windowed aggregation. Written sequentially so file mod times
      // give the source the right arrival order. Staging happens outside
      // the measured trigger-execution time.
      // encoding-adaptive load (long nanos pre-r8, TIMESTAMP(MICROS,ntz)
      // r8+) — slice bounds computed on epoch micros either way
      import org.apache.spark.sql.functions.{col, unix_micros}
      val raw = Tables.events(spark, sfDir)
      val bounds = raw.agg(
        org.apache.spark.sql.functions.min(unix_micros(col("ts"))),
        org.apache.spark.sql.functions.max(unix_micros(col("ts")))).head()
      val (tsMin, tsMax) = (bounds.getLong(0), bounds.getLong(1))
      val width = (tsMax - tsMin) / 8 + 1
      val in = java.nio.file.Files.createTempDirectory("graft_bench_in")
      val stage = java.nio.file.Files.createTempDirectory("graft_bench_stage")
      (0 until 8).foreach { i =>
        val lo = tsMin + i * width
        // compare the ts COLUMN against timestamp literals (pushable into
        // the parquet scan's row-group pruning) — wrapping ts itself in
        // unix_micros() would make all 8 staging scans read the full table
        raw.filter(col("ts") >= org.apache.spark.sql.functions.expr(s"timestamp_micros(${lo}L)")
            && col("ts") < org.apache.spark.sql.functions.expr(s"timestamp_micros(${lo + width}L)"))
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/s$i")
        val part = new java.io.File(s"$stage/s$i").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, in.resolve(f"slice_$i%02d.parquet"))
      }
      val src = streaming.StreamingJobs.fileSource(spark, in.toString,
        maxFilesPerTrigger = 1)
      val q = streaming.StreamingJobs.tumblingCounts(src)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val finished = q.awaitTermination(300000)
      if (!finished) {
        q.stop()
        throw new RuntimeException("stream replay timed out after 300s")
      }
      // steady-state rate: drop the first (codegen + state-store init)
      // batch, measure trigger-execution time (batch processing incl.
      // watermark tracking, state store, sink) — not wall clock, so query
      // startup/teardown doesn't swamp the replay
      q.recentProgress.foreach { p =>
        System.err.println(s"[bench] stream batch ${p.batchId}: rows=${p.numInputRows} durations=${p.durationMs}")
      }
      val (rows, procSec, medianEps) = steadyStats(q)
      (rows, procSec, medianEps, Some(in.toString))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] stream throughput FAILED: ${e.getMessage}")
        (0L, 0.0, 0.0, None)
    }
    // Per-processor throughput over the SAME time-sliced replay: one
    // AvailableNow run per raw-event stateful processor (fresh checkpoint,
    // noop sink) reporting each steady MEDIAN batch rows/s — so a
    // regression in one processor is attributable by name instead of
    // hiding inside the aggregate readout. The daily-profile monitors
    // (EWMA/SPC/CUSUM/drift/SCD2) consume tiny day×type tables where
    // rows/s is meaningless, and the doc-driven processors (topK,
    // inverted index) read a different corpus — all are
    // equivalence-spec'd in ScaleSmokeSpec instead. SPARK_GRAFT_BENCH_PROCS=0
    // disables the sweep.
    val perProcessor: Seq[(String, Long)] =
      if (sys.env.get("SPARK_GRAFT_BENCH_PROCS").contains("0")) Seq.empty
      else stagedIn.map { in =>
        import spark.implicits._
        import org.apache.spark.sql.functions.{col, lit, pmod}
        import streaming.StreamingJobs
        val schema = Tables.events(spark, sfDir).schema
        def src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
        def sess = src.select(col("user_id"), col("ts"), col("value"))
          .withWatermark("ts", "30 minutes").as[StreamingJobs.SessionInput]
        val jobs: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
          ("sessionize", "append", () => StreamingJobs.sessionize(sess).toDF),
          // sessionizeTimers sets its OWN watermark — feed it the bare
          // stream (redefining the watermark is an error in Spark 4)
          ("sessionize_timers", "append", () => StreamingJobs.sessionizeTimers(
            src.select(col("user_id"), col("ts"), col("value"))
              .as[StreamingJobs.SessionInput]).toDF),
          ("counters", "update", () => StreamingJobs.runningCounters(
            src.select(col("user_id"), col("ts"), col("value"))
              .as[StreamingJobs.SessionInput]).toDF),
          ("funnel", "append", () => StreamingJobs.funnelStages(
            src.select(col("user_id"), col("ts"), col("event_type"))
              .as[StreamingJobs.FunnelInput]).toDF),
          ("attribution", "append", () => StreamingJobs.attributionStream(
            src.select(col("user_id"), col("ts"), col("event_id"),
              col("event_type"), col("value"))
              .as[StreamingJobs.AttrInput]).toDF),
          ("hll_distinct", "update", () => StreamingJobs.hllDistinctStream(
            src.select(col("event_type"), col("user_id"))
              .as[StreamingJobs.HllInput]).toDF),
          ("misra_gries", "append", () => StreamingJobs.misraGriesStream(
            src.select(col("event_type"),
              pmod(col("user_id"), lit(50)).cast("long").as("item"))
              .as[StreamingJobs.MgInput], 8).toDF),
          ("reservoir", "append", () => StreamingJobs.reservoirStream(
            src.select(col("event_type"), col("event_id"))
              .as[StreamingJobs.ResInput], 16).toDF),
          ("rfm", "update", () => StreamingJobs.rfmStream(
            src.filter(col("event_type") === lit("purchase"))
              .select(col("user_id"), col("ts"), col("value"))
              .as[StreamingJobs.RfmInput]).toDF))
        jobs.flatMap { case (name, mode, build) =>
          try {
            val ckpt = java.nio.file.Files
              .createTempDirectory(s"graft_bench_proc_$name").toString
            val q = build().writeStream.format("noop").outputMode(mode)
              .option("checkpointLocation", ckpt)
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            if (!q.awaitTermination(120000)) {
              q.stop(); throw new RuntimeException("timed out after 120s")
            }
            val (rows, sec, medEps) = steadyStats(q)
            System.err.println(
              f"[bench] stream proc $name%-18s rows=$rows sec=$sec%6.2f median_eps=${medEps.round}")
            Some(name -> medEps.round)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] stream proc $name FAILED: ${e.getMessage}")
            None
          }
        }
      }.getOrElse(Seq.empty)
    // Ambient-noise calibration (r14 verdict: the driver's sealed run
    // overstated the suite ~24% under sandbox contention and had to be
    // adjudicated by hand). A fixed deterministic probe — the
    // q_filter_project plan over the tiny warm SF — is timed (median of
    // 3) at the start, middle, and end of the loop; noise_index compares
    // the run's median probe to the previous full snapshot's
    // (BENCH_LOCAL.json noise_probe_sec), so a run taken on a loaded box
    // flags itself in-band and steady_state_total_noise_adj restates the
    // steady total at the prior run's box speed.
    // CALIBRATION BASIS (r15 sealed-run lesson): the scan probe is more
    // contention-sensitive than the suite mix — the sealed r15 adj
    // over-corrected ~7% vs the quiet-box basis — so a SECOND probe from
    // the shuffle family (the q_agg_rollup plan, one exchange + rollup
    // aggregate) is timed the same way and published as
    // noise_probe_shuffle_sec / noise_index_shuffle. The two indices
    // bracket the contention character (scan-tax vs shuffle-tax);
    // steady_state_total_noise_adj stays on the scan index for
    // cross-round continuity and is DIRECTIONAL-ONLY — a loaded run
    // flags itself, the adjusted total is not a measurement.
    val probeName = "q_filter_project"
    val probeShuffleName = "q_agg_rollup"
    def noiseProbe(name: String): Double =
      if (!SparkEntry.queries.contains(name)) 0.0
      else {
        // a FAILED probe run must be discarded, not timed: recording its
        // time-to-exception (~ms) as a probe value would deflate
        // noise_index ~40x and poison the next run's prior
        val xs = (0 until 3).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, warmSf).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        }.sorted
        if (xs.isEmpty) 0.0 else xs(xs.size / 2)
      }
    // untimed: first-use codegen must not land in the probes
    noiseProbe(probeName); noiseProbe(probeShuffleName)
    val probeStart = noiseProbe(probeName)
    val probeShStart = noiseProbe(probeShuffleName)
    var probeMid = 0.0
    var probeShMid = 0.0
    val loopNames = SparkEntry.queries.keysIterator.filter(only).toSeq.sorted
    val results = loopNames.zipWithIndex.map { case (name, i) =>
      if (i == loopNames.size / 2) {
        probeMid = noiseProbe(probeName)
        probeShMid = noiseProbe(probeShuffleName)
      }
      name -> timeOne(name, SparkEntry.queries(name), recordFailure = true)
    }.toMap
    // Noise-robust tail: re-time the N slowest successful queries in
    // isolation after the loop. In-loop first-run numbers on this box carry
    // ±40% ambient load (r7: q_pagerank 11.9 s in-loop vs 8.4 s isolated;
    // r11: an in-run rerun of the identical q_pagerank plan moved +25%),
    // so the headline total inherits whatever the OS was doing during the
    // tail queries. steady_state_total replaces each re-timed query's
    // in-loop time with min(first, rerun) — a best-of-2 for exactly the
    // queries that dominate the total. The single-slowest first-vs-rerun
    // pair stays as the canary.
    //
    // COMPARISON BASIS (r12, after four phantom >30% "regressions" on
    // untouched code had to be hand-adjudicated in r11): the per-query
    // values REPORTED in the "queries" map are best-of-2 for the re-timed
    // tail (first-run elsewhere) — that map is the canonical per-query
    // regression basis. "total" stays the first-run sum for cross-round
    // continuity; "steady_state_total" is the best-of-2 sum and is the
    // canonical TOTAL basis. The tail is deep enough (24) to cover every
    // query the stdout line records.
    val probeEnd = noiseProbe(probeName)
    val probeShEnd = noiseProbe(probeShuffleName)
    def probeMedian(xs: Seq[Double]): Double = {
      val s = xs.filter(_ > 0).sorted
      if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    val noiseProbeSec = probeMedian(Seq(probeStart, probeMid, probeEnd))
    val noiseProbeShuffleSec = probeMedian(Seq(probeShStart, probeShMid, probeShEnd))
    System.err.println(f"[bench] noise probe ($probeName @ $warmSf, median-of-3): " +
      f"start=$probeStart%.3f mid=$probeMid%.3f end=$probeEnd%.3f -> $noiseProbeSec%.3f s")
    System.err.println(f"[bench] shuffle probe ($probeShuffleName @ $warmSf, median-of-3): " +
      f"start=$probeShStart%.3f mid=$probeShMid%.3f end=$probeShEnd%.3f -> " +
      f"$noiseProbeShuffleSec%.3f s")
    val failedSet0 = failed.toSet
    val rerunN = sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_N", "24").toInt
    val slowestN = results.collect { case (k, v) if !failedSet0(k) => (k, v) }
      .toSeq.sortBy { case (k, v) => (-v, k) }.take(rerunN)
    // Adaptive retime (r13 close-out lesson): the ±40% ambient noise
    // occasionally lands OUTSIDE the fixed slowest-N tail — r13 had to
    // hand-adjudicate two mid-pack queries whose in-loop time doubled on
    // untouched code. Any successful query whose in-loop time exceeds 2×
    // its value in the previous snapshot (BENCH_LOCAL.json's best-of-2
    // map) joins the rerun set, so the published map self-cleans instead
    // of shipping one-off scheduler hiccups as phantom regressions.
    // The snapshot is only a valid prior AT ITS OWN SCALE FACTOR: a
    // subset/profiling run at a different SF would otherwise classify up
    // to 8 queries as >2x "regressions" on cross-SF ratios and burn
    // serial reruns on them (ADVICE r14) — and the noise probe's prior is
    // SF-bound for the same reason.
    val (priorTimes, priorProbe, priorProbeShuffle)
        : (Map[String, Double], Option[Double], Option[Double]) =
      try {
        val p = java.nio.file.Paths.get("BENCH_LOCAL.json")
        if (!java.nio.file.Files.exists(p)) (Map.empty, None, None)
        else {
          val s = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          val sfPrior = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
          if (!sfPrior.contains(sfDir)) {
            System.err.println(s"[bench] prior snapshot sf=${sfPrior.getOrElse("?")} " +
              s"!= current $sfDir — adaptive retime and noise prior skipped")
            (Map.empty, None, None)
          } else {
            val probe = "\"noise_probe_sec\":([0-9.]+)".r
              .findFirstMatchIn(s).map(_.group(1).toDouble)
            val probeSh = "\"noise_probe_shuffle_sec\":([0-9.]+)".r
              .findFirstMatchIn(s).map(_.group(1).toDouble)
            val start = s.indexOf("\"queries\":{")
            val times =
              if (start < 0) Map.empty[String, Double]
              else {
                val body = s.substring(start + 11, s.indexOf('}', start))
                "\"([^\"]+)\":([0-9.]+)".r.findAllMatchIn(body)
                  .map(m => m.group(1) -> m.group(2).toDouble).toMap
              }
            (times, probe, probeSh)
          }
        }
      } catch { case _: Throwable => (Map.empty, None, None) }
    val suspects = results.collect {
      // the 0.5 s floor keeps sub-second scheduling jitter (0.1 → 0.25 s)
      // from triggering pointless reruns
      case (k, v) if !failedSet0(k) && v >= 0.5 &&
        priorTimes.get(k).exists(prior => v > 2 * prior) => (k, v)
    }.toSeq.filterNot(s => slowestN.exists(_._1 == s._1))
      // bounded: a GLOBALLY slow run (sustained background load) would
      // otherwise sweep half the suite into serial reruns on exactly the
      // runs that are already slow — keep the worst ratios only
      .sortBy { case (k, v) => (-(v / priorTimes(k)), k) }.take(8)
    if (suspects.nonEmpty)
      System.err.println("[bench] adaptive retime (in-loop > 2x prior snapshot): " +
        suspects.map { case (k, v) =>
          f"$k ${priorTimes(k)}%.2f->$v%.2f" }.mkString(", "))
    val reruns: Map[String, Double] = (slowestN ++ suspects).map { case (name, _) =>
      name -> timeOne(name, SparkEntry.queries(name), recordFailure = false)
    }.toMap
    val slowest = slowestN.headOption
    val slowestRerun = slowest.map { case (name, _) => reruns(name) }
    // Grouped mode: the per-query loop pays a ~0.9 s plan+schedule floor
    // per query, which at 200+ queries dominates the total and measures
    // Spark session scheduling, not the engine. The grouped pass runs the
    // suite in waves of SPARK_GRAFT_BENCH_GROUP queries: each wave builds
    // its members' frames (serially — iterative queries run their eager
    // per-round actions here), normalizes each to a 1-row count aggregate,
    // and evaluates the whole wave as ONE union job so the scheduler
    // overlaps the members' stages. grouped_total is the amortized-floor
    // companion to `total`; 0 disables.
    val groupN = sys.env.getOrElse("SPARK_GRAFT_BENCH_GROUP", "8").toInt
    val failedSetG = failed.toSet
    val groupedTotal: Option[Double] =
      if (groupN <= 1) None
      else {
        // reduce each member to sum(xxhash64(all columns)), NOT count(1):
        // a bare count lets ColumnPruning drop every projection expression
        // (and the scan's columns) so map-heavy queries would measure ~0
        // work. Hashing the full output row keeps each query's expressions
        // and reads live. Trailing ORDER BYs are still eliminated under
        // the aggregate (EliminateSorts) — grouped_total measures the
        // unsorted dataflow, stated here so the serial/grouped gap is
        // interpreted correctly.
        import org.apache.spark.sql.functions.{col => gcol, struct => gstruct,
          sum => gsum, xxhash64 => gxx}
        var tot = 0.0
        results.collect { case (k, _) if !failedSetG(k) => k }
          .toSeq.sorted.grouped(groupN).foreach { wave =>
            val t0 = System.nanoTime()
            try {
              wave.map { n =>
                val q = SparkEntry.queries(n)(spark, sfDir)
                q.agg(gsum(gxx(gstruct(q.columns.map(gcol): _*))))
              }.reduce(_.unionAll(_)).count()
            } catch { case e: Throwable =>
              System.err.println(s"[bench] grouped wave ${wave.head}.. FAILED: ${e.getMessage}")
            }
            val dt = (System.nanoTime() - t0) / 1e9
            tot += dt
            System.err.println(
              f"[bench] grouped wave ${wave.head}%-24s +${wave.size - 1} others $dt%7.2f s")
            spark.catalog.clearCache()
            if (interGc) System.gc()
          }
        Some(tot)
      }
    val streamEps = if (streamSec > 0) streamRows / streamSec else 0.0
    // 3-decimal (millisecond) precision for per-query times
    def ms3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // failed queries report their time-to-failure per-query but are excluded
    // from the headline total, so totals stay comparable across rounds
    val failedSet = failed.toSet
    val total = results.collect { case (k, v) if !failedSet(k) => v }.sum
    // best-of-2 for the re-timed tail, first-run for everything else
    val steadyTotal = results.collect { case (k, v) if !failedSet(k) =>
      math.min(v, reruns.getOrElse(k, v))
    }.sum
    // noise_index > 1 ⇒ this run's box was slower than the snapshot's
    // (ambient load); the adjusted total restates steady_state_total at
    // the prior run's box speed so cross-round diffs compare engines,
    // not schedulers. First full run (no prior) reports index 1.
    val noiseIndex = priorProbe match {
      case Some(p) if p > 0 && noiseProbeSec > 0 => noiseProbeSec / p
      case _ => 1.0
    }
    // the shuffle-family twin: scan and shuffle indices together bracket
    // the contention character; the adj total stays on the scan index
    val noiseIndexShuffle = priorProbeShuffle match {
      case Some(p) if p > 0 && noiseProbeShuffleSec > 0 => noiseProbeShuffleSec / p
      case _ => 1.0
    }
    // r16 ADVICE: adjust by the WORSE of the two probes, so a
    // shuffle-contended-but-scan-quiet box still corrects the total —
    // dividing by the scan index alone understated that contention class
    val steadyNoiseAdj = steadyTotal / math.max(noiseIndex, noiseIndexShuffle)
    if (noiseIndex > 1.2 || noiseIndexShuffle > 1.2)
      System.err.println(f"[bench] WARNING: noise_index=$noiseIndex%.2f " +
        f"noise_index_shuffle=$noiseIndexShuffle%.2f — this run shared the box " +
        "with ambient load; steady_state_total_noise_adj is directional-only")
    val failures = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val slowestJson = (slowest, slowestRerun) match {
      case (Some((name, first)), Some(rerun)) =>
        s""","slowest":"$name","slowest_first_sec":${ms3(first)},"slowest_rerun_sec":${ms3(rerun)}"""
      case _ => ""
    }
    // The driver captures only the LAST ~2000 chars of stdout and parses
    // the JSON line out of that tail; sbt's "[success] Total time..."
    // trailer also lands inside the window. A full per-query map for ~100
    // queries is ~2.4 KB, so every round through r4 overflowed the window
    // and the driver recorded `parsed: null`. Emit two artifacts:
    //   - BENCH_LOCAL.json: the complete map, all queries (for humans/judge)
    //   - stdout: one line with the SLOWEST queries only, trimmed until the
    //     line fits the window with margin; queries_omitted says how many
    //     sub-threshold (fast) entries were elided.
    val procJson =
      if (perProcessor.isEmpty) ""
      else perProcessor.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","stream_per_processor":{""", ",", "}")
    def lineFor(qs: Seq[(String, Double)], omitted: Int): String = {
      val qjson = qs.map { case (k, v) => "\"" + k + "\":" + ms3(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted,"queries_full":"BENCH_LOCAL.json"""" else ""
      val grouped = groupedTotal
        .map(g => s""","grouped_total":${ms3(g)},"group_n":$groupN""").getOrElse("")
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":$qjson,"queries_basis":"best_of_2_for_${rerunN}_slowest_plus_${suspects.size}_adaptive_first_run_rest"$om,"failures":$failures,"gc_in_queries_sec":${ms3(gcInQueries / 1e3)},"stream_rows":$streamRows,"stream_rows_per_sec":${streamEps.round},"median_batch_rows_per_sec":${streamMedianEps.round}$procJson$slowestJson,"steady_state_total":${ms3(steadyTotal)},"noise_probe_sec":${ms3(noiseProbeSec)},"noise_index":${ms3(noiseIndex)},"noise_probe_shuffle_sec":${ms3(noiseProbeShuffleSec)},"noise_index_shuffle":${ms3(noiseIndexShuffle)},"steady_state_total_noise_adj":${ms3(steadyNoiseAdj)}$grouped,"sf":"$sfDir","total_sec":${ms3(total)}}"""
    }
    // canonical per-query values: best-of-2 where a rerun exists
    val bySlowest = results.map { case (k, v) =>
      k -> math.min(v, reruns.getOrElse(k, v))
    }.toSeq.sortBy { case (k, v) => (-v, k) }
    val fullJson = lineFor(bySlowest, 0)
    // a SPARK_GRAFT_BENCH_ONLY subset run must not clobber the full-suite
    // snapshot — it is the adaptive-retime prior and the cross-round record.
    // AMBIENT GUARD (r16 verdict #4: the sealed driver run overwrote the
    // quiet snapshot with ambient-flagged numbers twice, r15+r16): a run
    // whose own worse probe exceeds 1.1 is box-contaminated and goes to
    // BENCH_AMBIENT.json instead, preserving the quiet cross-round basis.
    val worstNoise = math.max(noiseIndex, noiseIndexShuffle)
    val snapshotFile =
      if (worstNoise > 1.1) {
        System.err.println(f"[bench] ambient guard: worst noise index " +
          f"$worstNoise%.3f > 1.1 — snapshot diverted to BENCH_AMBIENT.json; " +
          "BENCH_LOCAL.json (the quiet prior) left untouched")
        "BENCH_AMBIENT.json"
      } else "BENCH_LOCAL.json"
    if (only == SparkEntry.queries.keySet)
      try java.nio.file.Files.write(java.nio.file.Paths.get(snapshotFile),
        (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $snapshotFile write failed: ${e.getMessage}") }
    else System.err.println("[bench] subset run: BENCH_LOCAL.json left untouched")
    // largest slowest-prefix whose line fits in ~1700 chars (2000-char
    // window minus sbt trailer and safety margin). One pass over prefix
    // sums of entry lengths picks the cut point — not a rebuild of the
    // full JSON per candidate length — then the actual line is built once
    // and nudged down only if the estimate was off by a digit or two.
    val maxLine = 1700
    val json =
      if (fullJson.length <= maxLine) fullJson
      else {
        // cumulative "…\"k\":v," body length for the first n entries
        val prefixLen = bySlowest.scanLeft(0L) { case (acc, (k, v)) =>
          acc + k.length + ms3(v).length + 4 // quotes, colon, comma
        }.toArray
        val overhead = lineFor(Seq.empty, bySlowest.size).length
        var n = bySlowest.size - 1
        while (n > 0 && overhead + prefixLen(n) - 1 > maxLine) n -= 1
        var line = lineFor(bySlowest.take(n), bySlowest.size - n)
        while (n > 0 && line.length > maxLine) {
          n -= 1
          line = lineFor(bySlowest.take(n), bySlowest.size - n)
        }
        line
      }
    println(json)
    spark.stop()
  }
}
