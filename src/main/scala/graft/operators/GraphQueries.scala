package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a derived co-purchase graph (parts that
  * appear in the same order are linked). PageRank (Page et al. 1999,
  * public) is the second iterative operator family next to the
  * connected-components loop: per-round co-partitioned join + keyed sum,
  * lineage truncated by eager localCheckpoint each round — the shape that
  * holds on a 1000-executor cluster, where the rank table shuffles on the
  * same key every round and the edge table is checkpointed once.
  */
object GraphQueries extends QueryModule {

  private val iterations = 8
  private val damping = 0.85

  /** Distinct (order, part) basket rows — the bipartite input every
    * co-purchase analysis here starts from. Callers that reuse the frame
    * more than once checkpoint it themselves.
    */
  private[operators] def orderItems(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()

  /** Co-purchase pair supports `(a < b, s_ab)` — the bounded self-join
    * (per-order fanout ≤ order size) shared by market basket, triangle
    * counting, item-item CF, and the recursive-CTE reachability seed.
    * One definition so the support algebra cannot drift between them;
    * each caller applies its own support floor.
    */
  private[operators] def itemPairs(items: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    items.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))

  /** Oracle twins of [[orderItems]] / [[itemPairs]]. */
  private[operators] val itemsSql =
    "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
  private[operators] val pairsSql =
    """SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS s_ab
       FROM items x JOIN items y
         ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
       GROUP BY 1, 2"""

  /** The PageRank loop over a directed edge list `edges(src, dst)` (may
    * be a multigraph — parallel edge rows weight the flow; every node
    * must appear as both src and dst, which symmetric graphs guarantee).
    * Per-round ranks are rounded to 7 decimals via [[Ql.r]] so summation
    * order cannot leak into the result. Checkpoints every fourth round:
    * lineage must be truncated periodically (unbounded plans re-analyze
    * superlinearly — see [[ClusterQueries.connectedComponents]]) but a
    * per-round barrier costs a full job each, and letting AQE fuse the
    * rounds in between more than halves wall time. With the cadence
    * dividing the round count, the post-loop materialization that anchors
    * the block release IS the last scheduled checkpoint — no extra
    * full-table pass beyond the loop's own barriers.
    *
    * Exposed (not query-private) so PropertySpec can assert the algebra
    * — mass conservation, uniformity on regular graphs — on synthetic
    * graphs.
    *
    * Block hygiene: every `localCheckpoint(true)` here pins materialized
    * RDD blocks in the block manager, and nothing else ever releases
    * them — in a long multi-tenant driver session that is a leak (r6
    * verdict measured rerun-slower-than-first + 324 MB heap growth from
    * exactly this). So the final ranks frame (node-count-sized) is
    * checkpointed too, making it self-contained, and every intermediate
    * persisted during the loop is then unpersisted before returning —
    * cache scope = this function, the same contract as
    * [[DedupQueries]]' containment/segment queries.
    */
  def pageRank(edgesIn: org.apache.spark.sql.DataFrame, rounds: Int,
      cadence: Int = 4): org.apache.spark.sql.DataFrame = {
    val sc = edgesIn.sparkSession.sparkContext
    // snapshot of persisted RDDs before this call: queries run one at a
    // time in verify/bench/specs, so everything persisted between here
    // and the post-loop snapshot is ours to release
    val before = sc.getPersistentRDDs.keySet
    // checkpoint the edge table PRE-PARTITIONED by src with the
    // partitioning DECLARED on the flat leaf (CheckpointBridge): a plain
    // localCheckpoint under AQE reports unknown partitioning and every
    // round re-shuffles the full edge table (verified via Scratch
    // copart_check), while a .cache() keeps the partitioning but not the
    // lineage truncation — the per-round Catalyst re-analysis over the
    // un-truncated subtree tripled the loop (measured 5.5 → 15.4 s,
    // NOTES #13). With the declared leaf, every round's src-keyed join
    // STREAMS the edges in place and only the small weight side moves
    // (guide §2.4; at 100 TB: rounds × |nodes| instead of
    // rounds × |edges| shuffled bytes). SHUFFLE_HASH hints keep the
    // joins sort-free — SMJ would re-sort the checkpointed edges every
    // round, and the broadcast alternative rebuilds + ships the weight
    // table per round.
    val edges = org.apache.spark.sql.graftbridge.CheckpointBridge
      .localCheckpointPartitionedBy(edgesIn, Seq("src"))
    // deg and the node count feed EVERY round — materialize once, or
    // each iteration re-runs their aggregations over the edge table
    // (measured: 9.5 s → ~5.5 s at sf0.1 for the whole query); deg's
    // aggregation inherits the declared src partitioning (no exchange)
    // and is re-declared on its own checkpoint for the per-round join
    val deg = org.apache.spark.sql.graftbridge.CheckpointBridge
      .localCheckpointPartitionedBy(
        edges.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
    // node count as a 1-row broadcast, not a driver-side collect —
    // derived from the checkpointed DEGREE table (one row per src, so
    // count(*) == countDistinct(src) over edges exactly) instead of a
    // second distinct-aggregate pass over the edge table (r17 session 2;
    // leaving the initial rank frame lazy instead was measured and
    // REGRESSED 8.0 → 11.4 s — the un-truncated crossJoin subtree rides
    // into all four fused rounds of the first cadence window)
    val nRow = deg.agg(count(lit(1)).cast("double").as("n"))
      .localCheckpoint(true)
    var ranks = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint(true)
    for (i <- 1 to rounds) {
      // weight each node's outgoing contribution once, then fan out
      // along edges and sum per destination — no dangling-node
      // redistribution term because every src is also a dst
      val wt = ranks.join(deg.hint("shuffle_hash"), ranks("node") === deg("src"))
        .select(col("src"), (col("pr") / col("d")).as("w"))
      ranks = edges.join(wt.hint("shuffle_hash"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("s"))
        .crossJoin(broadcast(nRow))
        .select(col("dst").as("node"),
          Ql.r(lit(1 - damping) / col("n") + lit(damping) * col("s"), 7).as("pr"))
      if (i % cadence == 0 && i < rounds) ranks = ranks.localCheckpoint(true)
    }
    // materialize the final frame so it no longer depends on the loop's
    // pinned blocks, then release every block this call persisted
    val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
    val out = ranks.localCheckpoint(true)
    mine.values.foreach(_.unpersist(blocking = false))
    out
  }

  /** Run-to-convergence PageRank: the [[pageRank]] update loop with an
    * L1-delta stop instead of a fixed round count — iterate until
    * Σ|prₜ − prₜ₋₁| < tol (or fail past maxRounds, the
    * [[kcoreConverged]] contract). The per-round step is IDENTICAL to
    * [[pageRank]]'s (same joins, same 7-dp [[Ql.r]] rounding), so after
    * k rounds the two produce byte-equal ranks — PropertySpec proves
    * loop == fixed-round where the fixed count suffices, and that on a
    * slow-mixing graph the loop runs past the fixed count and lands
    * within tol of the fixpoint where the fixed variant does not. The
    * delta is a 1-row aggregate fetched per round (the convergence
    * decision is driver-side by necessity, as in [[kcoreConverged]]);
    * each round localCheckpoints — the delta's action materializes the
    * new ranks anyway, so the barrier is free and lineage stays flat.
    * The oracled q_pagerank keeps the fixed-round contract (a shared
    * round constant is what makes the DuckDB twin exact); this variant
    * is for production runs where the mixing time is unknown.
    */
  def pageRankConverged(edgesIn: org.apache.spark.sql.DataFrame, tol: Double,
      maxRounds: Int = 100): (org.apache.spark.sql.DataFrame, Int) = {
    val sc = edgesIn.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // src-partitioned declared checkpoints + sort-free hash joins: same
    // rationale and measurements as [[pageRank]]
    val edges = org.apache.spark.sql.graftbridge.CheckpointBridge
      .localCheckpointPartitionedBy(edgesIn, Seq("src"))
    val deg = org.apache.spark.sql.graftbridge.CheckpointBridge
      .localCheckpointPartitionedBy(
        edges.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
    val nRow = edges.agg(countDistinct(col("src")).cast("double").as("n"))
      .localCheckpoint(true)
    var ranks = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint(true)
    var rounds = 0
    var delta = Double.MaxValue
    while (delta >= tol && rounds < maxRounds) {
      val wt = ranks.join(deg.hint("shuffle_hash"), ranks("node") === deg("src"))
        .select(col("src"), (col("pr") / col("d")).as("w"))
      val next = edges.join(wt.hint("shuffle_hash"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("s"))
        .crossJoin(broadcast(nRow))
        .select(col("dst").as("node"),
          Ql.r(lit(1 - damping) / col("n") + lit(damping) * col("s"), 7).as("pr"))
        .localCheckpoint(true)
      delta = next.join(ranks.select(col("node"), col("pr").as("pr0")), "node")
        .agg(sum(abs(col("pr") - col("pr0"))).as("d")).head().getDouble(0)
      ranks = next
      rounds += 1
    }
    if (delta >= tol)
      throw new IllegalStateException(
        s"PageRank did not converge to $tol in $maxRounds rounds (delta=$delta)")
    val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
    val out = ranks.localCheckpoint(true)
    mine.values.foreach(_.unpersist(blocking = false))
    (out, rounds)
  }

  /** Fixed-iteration PageRank, not run-to-convergence: a fixed round
    * count makes the result deterministic enough to oracle (the DuckDB
    * twin unrolls the same `iterations` rounds as chained CTEs — the two
    * engines share the constant, so they cannot drift). 8 rounds: on this
    * graph (max in-degree ~600, damping 0.85) the top-20 ranking is
    * already stable under the per-round 7-dp rounding — round 9-10 moved
    * nothing but sub-rounding residue while costing 20% of the suite's
    * most expensive query. Every per-round rank is rounded through
    * [[Ql.r]] in BOTH engines, so double-summation order differences
    * (~1e-16) are quenched each round instead of compounding.
    *
    * Scale notes: the co-purchase self-join fans out at most
    * order_size² per order (TPC-H order size is bounded by 7); the edge
    * list is localCheckpointed ONCE, then each round is one src-keyed
    * join + one dst-keyed aggregation; the final top-20 is
    * TakeOrderedAndProject, never a global sort.
    */
  private val pagerank = QueryDef(
    "q_pagerank",
    (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      // multigraph, deliberately: a pair co-purchased in k orders keeps k
      // edge rows, so edge strength weights the rank flow — and the
      // near-no-op DISTINCT (0.3% of pairs repeat) would cost a full
      // 2.4M-row shuffle at sf0.1 for nothing
      val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      pageRank(edges, iterations)
        .orderBy(col("pr").desc, col("node")).limit(20)
        .select(col("node"), col("pr"))
    },
    Some {
      val rounds = (1 to iterations).map { i =>
        s"""r$i AS (
          SELECT e.dst AS node,
                 ${Ql.R(s"${1 - damping} / (SELECT n FROM nn) + $damping * sum(r${i - 1}.pr / deg.d)", 7)} AS pr
          FROM edges e
            JOIN r${i - 1} ON e.src = r${i - 1}.node
            JOIN deg ON e.src = deg.src
          GROUP BY 1)"""
      }.mkString(",\n")
      s"""
      WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges),
      r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
      $rounds
      SELECT node, pr FROM r$iterations ORDER BY pr DESC, node LIMIT 20
    """
    })

  /** Market-basket association rules over the same co-occurrence data:
    * support / confidence / lift for part pairs bought in the same order
    * (Agrawal & Srikant's Apriori setting, public; the 2-itemset level is
    * the join-expressible core). The support floor (>= 3 orders) prunes
    * the pair space BEFORE the ratio math, and the per-order fanout is
    * bounded by order size, so the pair aggregation — the only data-sized
    * step — is one bounded self-join + keyed count at any scale. Top 20
    * by lift is TakeOrderedAndProject.
    */
  private val marketBasket = QueryDef(
    "q_market_basket",
    (spark, sfDir) => {
      val items = orderItems(spark, sfDir)
        .localCheckpoint(true) // feeds supports, pairs, and the order count
      val nOrders = items.agg(countDistinct(col("l_orderkey")).cast("double").as("n_orders"))
      val supp = items.groupBy("l_partkey").agg(count(lit(1)).as("s"))
      val pairs = itemPairs(items).filter(col("s_ab") >= 3)
      pairs
        .join(supp.select(col("l_partkey").as("a"), col("s").as("s_a")), "a")
        .join(supp.select(col("l_partkey").as("b"), col("s").as("s_b")), "b")
        .crossJoin(broadcast(nOrders))
        .select(col("a"), col("b"), col("s_ab"),
          Ql.r(col("s_ab") / col("s_a"), 4).as("confidence"),
          Ql.r(col("s_ab") * col("n_orders") / (col("s_a") * col("s_b")), 4).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
    },
    Some(s"""
      WITH items AS ($itemsSql),
      nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items),
      supp AS (SELECT l_partkey, count(*) AS s FROM items GROUP BY 1),
      pairs AS (SELECT * FROM ($pairsSql) WHERE s_ab >= 3)
      SELECT a, b, s_ab,
             ${Ql.R("s_ab / sa.s", 4)} AS confidence,
             ${Ql.R("s_ab * (SELECT n_orders FROM nn) / (sa.s * sb.s)", 4)} AS lift
      FROM pairs
        JOIN supp sa ON sa.l_partkey = a
        JOIN supp sb ON sb.l_partkey = b
      ORDER BY lift DESC, a, b LIMIT 20
    """))

  /** Triangle counting over the support-≥2 co-purchase graph, by DEGREE
    * ORIENTATION (Schank & Wagner 2005 / the MapReduce form in Suri &
    * Vassilvitskii 2011, both public): orient every undirected edge from
    * its lower-(degree, id) endpoint to the higher one, build wedges only
    * from each node's OUT-edges, and close them against oriented edges.
    * Out-degree under this orientation is O(√m), so the wedge join — the
    * only superlinear step — is bounded Σ outdeg² = O(m^1.5) no matter
    * how skewed the degree distribution is; a hub with a million
    * neighbors contributes almost no wedges because nearly all its edges
    * point INTO it. That bound is the difference between this running at
    * 100 TB and the naive wedge join (Σ deg²) dying on the first hub.
    *
    * The oracle counts the same triangles with the plain id-ordered
    * 3-join (orientation never changes the count, which is exactly what
    * the hash match proves); `n_wedges` is the orientation-free
    * Σ deg(v)·(deg(v)−1)/2, so both engines agree on it trivially, and
    * the global clustering coefficient 3·tri/wedges comes out of the
    * same integers.
    */
  private val triangleCount = QueryDef(
    "q_triangle_count",
    (spark, sfDir) => {
      // bounded per-order fanout (TPC-H order size <= 7); support >= 2
      // prunes the incidental-pair noise the same way q_market_basket does
      val edges = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 2).select("a", "b")
        .localCheckpoint(true) // feeds deg, orientation, and the closing join
      val deg = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val keyed = edges
        .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
      val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
      val oriented = keyed.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("kd"))
        .localCheckpoint(true)
      val o1 = oriented.select(col("src"), col("dst").as("d1"), col("kd").as("k1"))
      val o2 = oriented.select(col("src"), col("dst").as("d2"), col("kd").as("k2"))
      val wedges = o1.join(o2, "src")
        .filter(col("k1") < col("k2") || (col("k1") === col("k2") && col("d1") < col("d2")))
      val tri = wedges.join(
          oriented.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_triangles"))
      val stats = deg.agg(
        (sum(col("dg") * (col("dg") - 1)) / 2).cast("long").as("n_wedges"))
      edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(stats))   // three 1-row frames
        .crossJoin(broadcast(tri))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          // a wedge-free graph (perfect matching) must not divide by zero
          // — Spark's NULL vs DuckDB's IEEE inf would diverge the engines
          when(col("n_wedges") === 0L, lit(0.0)).otherwise(
            Ql.r(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)).as("clustering"))
    },
    Some(s"""
      WITH items AS ($itemsSql),
      edges AS (SELECT a, b FROM ($pairsSql) WHERE s_ab >= 2),
      deg AS (
        SELECT v, count(*) AS dg FROM (
          SELECT a AS v FROM edges UNION ALL SELECT b FROM edges) GROUP BY 1),
      tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1 JOIN edges e2 ON e1.b = e2.a
          JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT (SELECT count(*) FROM edges) AS n_edges,
             (SELECT CAST(sum(dg * (dg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
             (SELECT n_triangles FROM tri) AS n_triangles,
             CASE WHEN (SELECT sum(dg * (dg - 1)) FROM deg) = 0 THEN 0.0
                  ELSE ${Ql.R("3.0 * (SELECT n_triangles FROM tri) / (SELECT sum(dg * (dg - 1)) / 2 FROM deg)", 6)}
             END AS clustering
    """))

  /** Item-item collaborative filtering (Linden et al. 2003's
    * amazon.com item-to-item CF, public): cosine similarity over the
    * order-basket co-occurrence counts, top-10 neighbors per item. The
    * cosine needs only the three counts (s_ab, s_a, s_b) already
    * produced by the bounded pair aggregation, so the whole recommender
    * is the market-basket plan plus two broadcast-sized support joins —
    * no per-user vectors materialize anywhere. Ranked on the ROUNDED
    * cosine with a neighbor-id tiebreak; top-10 per item plans as
    * WindowGroupLimit (a k-row heap per item, no per-item sort).
    */
  /** The item-CF top-10 ranking shared by q_item_cf (serving the lists)
    * and q_rec_coverage (auditing them) — ONE definition so the audit
    * can never drift from the ranking it claims to audit (support
    * floor, rounding scale, tiebreak all live here). Returns
    * (item, rank, nbr, cosine); the input frame is checkpointed because
    * it feeds supports and pairs.
    */
  private[operators] def cfTopK(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = orderItems(spark, sfDir)
      .localCheckpoint(true) // feeds supports and pairs
    val supp = items.groupBy("l_partkey").agg(count(lit(1)).as("s"))
    val pairs = itemPairs(items).filter(col("s_ab") >= 2)
    val directed = pairs.select(col("a").as("item"), col("b").as("nbr"), col("s_ab"))
      .unionByName(pairs.select(col("b").as("item"), col("a").as("nbr"), col("s_ab")))
    val w = Window.partitionBy("item").orderBy(col("cosine").desc, col("nbr"))
    directed
      .join(supp.select(col("l_partkey").as("item"), col("s").as("s_i")), "item")
      .join(supp.select(col("l_partkey").as("nbr"), col("s").as("s_n")), "nbr")
      .withColumn("cosine", Ql.r(col("s_ab") / sqrt(col("s_i") * col("s_n")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("item"), col("rank"), col("nbr"), col("cosine"))
  }

  /** Oracle twin of [[cfTopK]]: the chained CTEs through `topk`. */
  private[operators] val cfTopKSql = s"""items AS ($itemsSql),
      supp AS (SELECT l_partkey, count(*) AS s FROM items GROUP BY 1),
      pairs AS (SELECT * FROM ($pairsSql) WHERE s_ab >= 2),
      directed AS (
        SELECT a AS item, b AS nbr, s_ab FROM pairs
        UNION ALL SELECT b, a, s_ab FROM pairs),
      scored AS (
        SELECT item, nbr,
               ${Ql.R("s_ab / sqrt(si.s * sn.s)", 4)} AS cosine
        FROM directed
          JOIN supp si ON si.l_partkey = item
          JOIN supp sn ON sn.l_partkey = nbr),
      topk AS (
        SELECT item,
               CAST(row_number() OVER (PARTITION BY item ORDER BY cosine DESC, nbr) AS INT) AS rank,
               nbr, cosine
        FROM scored
        QUALIFY rank <= 10)"""

  private val itemCf = QueryDef(
    "q_item_cf",
    (spark, sfDir) => cfTopK(spark, sfDir).orderBy("item", "rank"),
    Some(s"""
      WITH $cfTopKSql
      SELECT item, rank, nbr, cosine
      FROM topk
      ORDER BY item, rank
    """))

  /** Frequent 3-itemsets — the Apriori level the 2-itemset market basket
    * stops short of. Candidate triples are pruned by ANTIMONOTONICITY
    * before counting: every ordered sub-pair (a,b), (b,c), (a,c) must
    * itself be a frequent pair (three semi-joins against the broadcast-
    * scale frequent-pair set), so the per-order triple fanout (≤ C(7,3))
    * never reaches the aggregation for unsupported combinations — the
    * pruning that keeps level-3 tractable when the item catalog is 10⁸.
    * The oracle counts triples directly with HAVING ≥ 2; antimonotonicity
    * guarantees the pruned plan returns the identical set, and the hash
    * match proves it.
    */
  private val itemsets3 = QueryDef(
    "q_itemsets3",
    (spark, sfDir) => {
      val items = orderItems(spark, sfDir)
        .localCheckpoint(true) // feeds the triple join and the pair prune
      val fp = itemPairs(items).filter(col("s_ab") >= 2)
        .select("a", "b").localCheckpoint(true) // reused by 3 semi-joins
      // the (a,b) prune runs BEFORE the third items join — that ordering
      // IS Apriori: the dominant join's input shrinks by the
      // infrequent-pair fraction (the vast majority) instead of fanning
      // every order's C(n,3) triples out first and pruning after
      val triples = items.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
        .filter(col("a") < col("b"))
        .join(fp, Seq("a", "b"), "leftsemi")
        .join(items.select(col("l_orderkey"), col("l_partkey").as("c")), "l_orderkey")
        .filter(col("b") < col("c"))
      triples
        .join(fp.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"), "leftsemi")
        .join(fp.select(col("a"), col("b").as("c")), Seq("a", "c"), "leftsemi")
        .groupBy("a", "b", "c").agg(count(lit(1)).as("s"))
        .filter(col("s") >= 2)
        .orderBy(col("s").desc, col("a"), col("b"), col("c")).limit(20)
    },
    Some(s"""
      WITH items AS ($itemsSql)
      SELECT x.l_partkey AS a, y.l_partkey AS b, z.l_partkey AS c,
             count(*) AS s
      FROM items x
        JOIN items y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        JOIN items z ON x.l_orderkey = z.l_orderkey AND y.l_partkey < z.l_partkey
      GROUP BY 1, 2, 3
      HAVING count(*) >= 2
      ORDER BY s DESC, a, b, c LIMIT 20
    """))

  /** RFM customer segmentation (recency / frequency / monetary — the
    * classic warehouse scoring, public retail analytics): one keyed
    * aggregation per customer, a 1-row broadcast of the corpus max date
    * for recency, and closed-form threshold bins (no per-metric quantile
    * pass — fixed business bands, so the whole job is scan + one shuffle
    * at any scale). Output is the segment histogram: customers and mean
    * monetary value per (r, f, m) cell.
    */
  private val rfmSegments = QueryDef(
    "q_rfm_segments",
    (spark, sfDir) => {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      val maxDate = o.agg(max(col("o_orderdate")).as("d_max"))
      val perCust = o.groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(col("o_totalprice")).as("monetary"))
        .crossJoin(broadcast(maxDate))
        .withColumn("recency_days", datediff(col("d_max"), col("last_order")))
      perCust
        .withColumn("r_score",
          when(col("recency_days") <= 180, 5).when(col("recency_days") <= 365, 4)
            .when(col("recency_days") <= 730, 3).when(col("recency_days") <= 1460, 2)
            .otherwise(1))
        .withColumn("f_score",
          when(col("freq") >= 15, 5).when(col("freq") >= 10, 4)
            .when(col("freq") >= 6, 3).when(col("freq") >= 3, 2).otherwise(1))
        .withColumn("m_score",
          when(col("monetary") >= 4000000.0, 5).when(col("monetary") >= 2500000.0, 4)
            .when(col("monetary") >= 1500000.0, 3).when(col("monetary") >= 500000.0, 2)
            .otherwise(1))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          Ql.r(avg(col("monetary")), 2).as("avg_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    },
    Some(s"""
      WITH mx AS (SELECT max(o_orderdate) AS d_max FROM orders),
      pc AS (
        SELECT o_custkey, max(o_orderdate) AS last_order,
               count(*) AS freq, sum(o_totalprice) AS monetary
        FROM orders GROUP BY 1),
      scored AS (
        SELECT CASE WHEN date_diff('day', last_order, (SELECT d_max FROM mx)) <= 180 THEN 5
                    WHEN date_diff('day', last_order, (SELECT d_max FROM mx)) <= 365 THEN 4
                    WHEN date_diff('day', last_order, (SELECT d_max FROM mx)) <= 730 THEN 3
                    WHEN date_diff('day', last_order, (SELECT d_max FROM mx)) <= 1460 THEN 2
                    ELSE 1 END AS r_score,
               CASE WHEN freq >= 15 THEN 5 WHEN freq >= 10 THEN 4
                    WHEN freq >= 6 THEN 3 WHEN freq >= 3 THEN 2 ELSE 1 END AS f_score,
               CASE WHEN monetary >= 4000000 THEN 5 WHEN monetary >= 2500000 THEN 4
                    WHEN monetary >= 1500000 THEN 3 WHEN monetary >= 500000 THEN 2
                    ELSE 1 END AS m_score,
               monetary
        FROM pc)
      SELECT r_score, f_score, m_score, count(*) AS n_customers,
             ${Ql.R("avg(monetary)", 2)} AS avg_monetary
      FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """))

  /** HITS hubs-and-authorities (Kleinberg 1999, public) over the
    * bipartite customer→part purchase graph: a part's authority is the
    * summed hub weight of its buyers, a customer's hub weight the summed
    * authority of their basket — 3 mutually-recursive rounds, L1
    * normalization (no sqrt — keeps the cross-engine arithmetic to
    * +,/,round). Same iterative discipline as [[pageRank]]: the edge
    * list materializes ONCE, each round is two keyed join+agg passes
    * with the normalizer as a 1-row broadcast (never a collect), scores
    * are rounded to 7 dp per round in BOTH engines so summation order
    * can't drift, and every block this query pins is released once the
    * final authority frame materializes. The oracle unrolls the same 3
    * rounds as chained CTEs.
    */
  private val hits = QueryDef(
    "q_hits",
    (spark, sfDir) => {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
      val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint(true)
      var hub = edges.select(col("c")).distinct().withColumn("h", lit(1.0))
      var auth: org.apache.spark.sql.DataFrame = null
      for (_ <- 1 to 3) {
        // node-sized checkpoint per half-round (r17 session 2): rawA/rawH
        // each feed TWO consumers (the 1-row normalizer and the next
        // half-round's weight table), and without a barrier the corpus-
        // sized edges⋈weights+agg subtree evaluates once per consumer —
        // AQE reuses the exchange but re-runs the broadcast/agg stages,
        // and the fused final plan re-analyzes the whole 6-half-round
        // lineage. One eager node-table materialization per half-round
        // (measured: 10.3 → 4.2 s steady in Scratch) replaces that; at
        // 100 TB the checkpoint is |nodes| rows against a rounds × |edges|
        // double evaluation.
        val rawA = edges.join(hub, "c").groupBy("p").agg(sum(col("h")).as("a0"))
          .localCheckpoint(true)
        val sumA = rawA.agg(sum(col("a0")).as("sa"))
        auth = rawA.crossJoin(broadcast(sumA))
          .select(col("p"), Ql.r(col("a0") / col("sa"), 7).as("a"))
        val rawH = edges.join(auth, "p").groupBy("c").agg(sum(col("a")).as("h0"))
          .localCheckpoint(true)
        val sumH = rawH.agg(sum(col("h0")).as("sh"))
        hub = rawH.crossJoin(broadcast(sumH))
          .select(col("c"), Ql.r(col("h0") / col("sh"), 7).as("h"))
      }
      val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      val authFinal = auth.localCheckpoint(true)
      mine.values.foreach(_.unpersist(blocking = false))
      authFinal.orderBy(col("a").desc, col("p")).limit(15)
        .select(col("p").as("partkey"), col("a").as("authority"))
    },
    Some {
      val rounds = (1 to 3).map { i =>
        val prevHub = if (i == 1) "h0" else s"h${i - 1}"
        s"""a${i}r AS (
          SELECT p, sum(h) AS a0 FROM edges JOIN $prevHub USING (c) GROUP BY 1),
        a$i AS (
          SELECT p, ${Ql.R(s"a0 / (SELECT sum(a0) FROM a${i}r)", 7)} AS a FROM a${i}r),
        h${i}r AS (
          SELECT c, sum(a) AS hv FROM edges JOIN a$i USING (p) GROUP BY 1),
        h$i AS (
          SELECT c, ${Ql.R(s"hv / (SELECT sum(hv) FROM h${i}r)", 7)} AS h FROM h${i}r)"""
      }.mkString(",\n")
      s"""
      WITH edges AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      h0 AS (SELECT DISTINCT c, 1.0 AS h FROM edges),
      $rounds
      SELECT p AS partkey, a AS authority FROM a3
      ORDER BY authority DESC, partkey LIMIT 15
    """
    })

  /** Degree assortativity of the co-purchase graph (Newman 2002,
    * public): the Pearson correlation of endpoint degrees across edges —
    * positive means hubs link to hubs (social-network shape), negative
    * means hubs link to leaves (dependency/catalog shape). The answer
    * drives partitioning strategy: a disassortative graph's hub-leaf
    * edges broadcast well, an assortative core does not. One degree
    * aggregation + two keyed joins of the degree table onto the edge
    * list + a single `corr` — each edge contributes its (deg_src,
    * deg_dst) pair once per direction, which makes the statistic
    * orientation-free on this symmetric graph. Report also carries the
    * mean degree and edge count so the coefficient reads in context.
    */
  private val assortativity = QueryDef(
    "q_assortativity",
    (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      edges
        .join(deg.select(col("src"), col("d").as("d_src")), "src")
        .join(deg.select(col("src").as("dst"), col("d").as("d_dst")), "dst")
        .agg(Ql.r(corr(col("d_src").cast("double"), col("d_dst").cast("double")), 4)
            .as("assortativity"),
          Ql.r(avg(col("d_src")), 4).as("mean_degree"),
          count(lit(1)).as("n_edges"))
    },
    Some(s"""
      WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1)
      SELECT ${Ql.R("corr(CAST(ds.d AS DOUBLE), CAST(dd.d AS DOUBLE))", 4)} AS assortativity,
             ${Ql.R("avg(ds.d)", 4)} AS mean_degree,
             count(*) AS n_edges
      FROM edges e
        JOIN deg ds ON ds.src = e.src
        JOIN deg dd ON dd.src = e.dst
    """))

  /** Log₂-binned degree distribution of the part-co-purchase graph — the
    * first diagnostic plotted for any graph workload (is it scale-free?
    * where does PageRank's skew come from?). The log bucket is
    * `length(bin(d)) − 1`, i.e. the index of the highest set bit —
    * exact integer/string arithmetic on BOTH engines, no libm log2 whose
    * exact-power-of-two behavior differs across implementations.
    */
  private val degreeHist = QueryDef(
    "q_degree_hist",
    (spark, sfDir) => {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
      edges.groupBy("src").agg(count(lit(1)).as("d"))
        .withColumn("bucket", (length(bin(col("d"))) - 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_nodes"), min(col("d")).as("min_d"),
          max(col("d")).as("max_d"), sum(col("d")).as("total_edges"))
        .orderBy("bucket")
    },
    Some("""
      WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1)
      SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS bucket,
             count(*) AS n_nodes, min(d) AS min_d, max(d) AS max_d,
             CAST(sum(d) AS BIGINT) AS total_edges
      FROM deg GROUP BY 1 ORDER BY 1
    """))

  /** k-core peeling (k=100, 3 unrolled rounds) over the co-purchase
    * graph: repeatedly drop nodes whose degree fell below k, reporting
    * per-round survivor/edge counts — the densest-subgraph audit that
    * explains PageRank/HITS mass concentration. Each round is one keyed
    * degree aggregation plus two semi-joins (both shuffle on the node
    * key); the edge list is localCheckpointed per round so round r+1
    * scans materialized edges instead of replaying r joins — the same
    * iterate-then-pin discipline as pageRank. All outputs are exact
    * integer counts: zero cross-engine float risk.
    */
  /** Convergence-loop k-core — the variant a graph of unknown depth
    * needs: peel until a round removes zero vertices (the oracled
    * q_kcore keeps its fixed 3-round contract because that is what the
    * SQL twin can express; the sf0.1 graph happens to settle in 3, a
    * bigger graph need not). Same per-round shape as q_kcore — one keyed
    * degree aggregation + two semi-joins — under the q_dedup_clusters
    * loop discipline: eager localCheckpoint each round so Catalyst never
    * re-analyzes the accumulated lineage, convergence decided on a
    * 1-row aggregate of the checkpointed degree table, every persisted
    * block released before returning, and a loud failure past maxRounds
    * rather than an unconverged answer. Termination is guaranteed anyway:
    * each non-final round strictly shrinks the vertex set, so rounds ≤
    * |V|; the k-core fixpoint is unique (the maximal subgraph with all
    * degrees ≥ k), so the loop cannot stabilize on a wrong answer.
    *
    * Input `edges` must be the symmetric directed pair list (both
    * orientations present, no self-loops), the q_kcore convention.
    * Returns (survivors(src, degree), rounds-to-converge).
    */
  def kcoreConverged(edges: org.apache.spark.sql.DataFrame, k: Int,
      maxRounds: Int = 50): (org.apache.spark.sql.DataFrame, Int) = {
    val sc = edges.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var e = edges.select("src", "dst").localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val d = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint(true)
      val Array(nNodes, nKept) = d
        .agg(count(lit(1)), sum(when(col("d") >= k, 1L).otherwise(0L)))
        .head().toSeq.map(v => if (v == null) 0L else v.asInstanceOf[Long]).toArray
      if (nKept == nNodes) converged = true
      else {
        val keep = d.filter(col("d") >= k).select("src")
        e = e.join(keep, "src")
          .join(keep.select(col("src").as("dst")), "dst")
          .select("src", "dst")
          .localCheckpoint(true)
        rounds += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(s"k-core did not converge in $rounds rounds")
    val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
    val out = e.groupBy("src").agg(count(lit(1)).as("degree")).localCheckpoint(true)
    mine.values.foreach(_.unpersist(blocking = false))
    (out, rounds)
  }

  private val kcore = QueryDef(
    "q_kcore",
    (spark, sfDir) => {
      val k = 100
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      var e = li.select(col("l_orderkey"), col("l_partkey").as("src"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst")
        .localCheckpoint(true)
      var stats: org.apache.spark.sql.DataFrame = null
      for (round <- 1 to 3) {
        // node-sized checkpoint (r17 session 2, the kcoreConverged shape):
        // d feeds the keep filter (inside this round's edge checkpoint)
        // AND the stats row (evaluated by the final action) — without the
        // barrier each round's degree aggregation over the edge table
        // runs twice (measured 5.2 → 4.5 s steady in Scratch)
        val d = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint(true)
        val keep = d.filter(col("d") >= k).select("src")
        val next = e.join(keep, "src")
          .join(keep.select(col("src").as("dst")), "dst")
          .select("src", "dst")
          .localCheckpoint(true)
        val row = d.agg(count(lit(1)).as("n_nodes"),
            sum(when(col("d") >= k, 1L).otherwise(0L)).as("n_kept"))
          .crossJoin(next.agg(count(lit(1)).as("n_edges")))
          .select(lit(round).as("round"), col("n_kept"),
            (col("n_nodes") - col("n_kept")).as("n_dropped"), col("n_edges"))
        stats = if (stats == null) row else stats.union(row)
        e = next
      }
      // 3-row result: materialize it off the pinned edge lists, then
      // release every block this call persisted (pageRank's contract)
      val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      val out = stats.orderBy("round").localCheckpoint(true)
      mine.values.foreach(_.unpersist(blocking = false))
      out
    },
    Some(s"""
      WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      e0 AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
      d0 AS (SELECT src, count(*) AS d FROM e0 GROUP BY 1),
      k0 AS (SELECT src FROM d0 WHERE d >= 100),
      e1 AS (SELECT e.src, e.dst FROM e0 e
             JOIN k0 a ON e.src = a.src JOIN k0 b ON e.dst = b.src),
      d1 AS (SELECT src, count(*) AS d FROM e1 GROUP BY 1),
      k1 AS (SELECT src FROM d1 WHERE d >= 100),
      e2 AS (SELECT e.src, e.dst FROM e1 e
             JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
      d2 AS (SELECT src, count(*) AS d FROM e2 GROUP BY 1),
      k2 AS (SELECT src FROM d2 WHERE d >= 100),
      e3 AS (SELECT e.src, e.dst FROM e2 e
             JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src)
      SELECT 1 AS round,
             CAST((SELECT count(*) FROM k0) AS BIGINT) AS n_kept,
             CAST((SELECT count(*) FROM d0) - (SELECT count(*) FROM k0) AS BIGINT) AS n_dropped,
             CAST((SELECT count(*) FROM e1) AS BIGINT) AS n_edges
      UNION ALL
      SELECT 2,
             CAST((SELECT count(*) FROM k1) AS BIGINT),
             CAST((SELECT count(*) FROM d1) - (SELECT count(*) FROM k1) AS BIGINT),
             CAST((SELECT count(*) FROM e2) AS BIGINT)
      UNION ALL
      SELECT 3,
             CAST((SELECT count(*) FROM k2) AS BIGINT),
             CAST((SELECT count(*) FROM d2) - (SELECT count(*) FROM k2) AS BIGINT),
             CAST((SELECT count(*) FROM e3) AS BIGINT)
      ORDER BY round
    """))

  /** Link prediction over the support-≥2 co-purchase graph: for every
    * distance-2 pair (a, b) NOT already linked, count common neighbors
    * (Liben-Nowell & Kleinberg 2003, public) and the resource-allocation
    * index Σ 1/deg(v) over the shared neighbors (Zhou, Lü & Zhang 2009,
    * public). Wedges are enumerated only through centers with
    * deg ≤ 50 — simultaneously the scale bound (Σ_{deg≤50} deg² ≤ 50·m,
    * so the wedge join stays linear in the edge count no matter how
    * skewed the graph) and the signal choice RA formalizes anyway: a hub
    * shared by everyone carries almost no evidence that two specific
    * neighbors should link. The candidate set is then anti-joined
    * against the edge list. Ranking is by the exact INTEGER cn with an
    * (a, b) tiebreak; ra is a reported 6-dp metric, never a sort key, so
    * the one double sum in the query cannot affect row identity. The
    * oracle mirrors the same cap and anti-join.
    */
  private val linkPred = QueryDef(
    "q_link_pred",
    (spark, sfDir) => {
      val edges = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 2).select("a", "b")
        .localCheckpoint(true) // feeds deg, wedges, and the anti-join
      val deg = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      // undirected adjacency around low-degree centers only
      val adj = edges.select(col("a").as("v"), col("b").as("u"))
        .unionByName(edges.select(col("b").as("v"), col("a").as("u")))
        .join(deg.filter(col("dg") <= 50), "v")
      val w1 = adj.select(col("v"), col("u").as("a"), col("dg"))
      val w2 = adj.select(col("v"), col("u").as("b"))
      val cand = w1.join(w2, "v").filter(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("cn"), Ql.r(sum(lit(1.0) / col("dg")), 6).as("ra"))
      cand.join(edges, Seq("a", "b"), "left_anti")
        .orderBy(col("cn").desc, col("a"), col("b"))
        .limit(20)
    },
    Some(s"""
      WITH items AS ($itemsSql),
      edges AS (SELECT a, b FROM ($pairsSql) WHERE s_ab >= 2),
      deg AS (
        SELECT v, count(*) AS dg FROM (
          SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        GROUP BY 1),
      adj AS (
        SELECT x.v, x.u, deg.dg FROM (
          SELECT a AS v, b AS u FROM edges
          UNION ALL SELECT b AS v, a AS u FROM edges) x
        JOIN deg ON deg.v = x.v AND deg.dg <= 50),
      cand AS (
        SELECT w1.u AS a, w2.u AS b,
               CAST(count(*) AS BIGINT) AS cn,
               ${Ql.R("sum(1.0 / w1.dg)", 6)} AS ra
        FROM adj w1 JOIN adj w2 ON w1.v = w2.v AND w1.u < w2.u
        GROUP BY 1, 2)
      SELECT a, b, cn, ra FROM cand
      WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.a = cand.a AND e.b = cand.b)
      ORDER BY cn DESC, a, b LIMIT 20
    """))

  /** Bounded Bellman-Ford single-source shortest paths over the weighted
    * co-purchase graph: 4 relaxation rounds from the minimum-id node,
    * edge cost = 100 div s_ab (stronger co-purchase support ⇒ cheaper
    * hop; INTEGER division so distances stay exact 64-bit sums — no
    * float accumulation to diverge). Each round is one keyed join
    * (frontier × adjacency) + a min-aggregation union — the same
    * co-partitioned iterative-join family as [[pageRank]], with per-round
    * localCheckpoint lineage truncation and block release on exit.
    * Bounded rounds = the k-hop neighborhood semantics a 100 TB graph
    * query actually ships (full convergence is a driver loop over the
    * same body, as [[ClusterQueries.connectedComponents]] runs). The
    * oracle unrolls the identical 4 rounds as chained CTEs.
    */
  private val sssp = QueryDef(
    "q_sssp",
    (spark, sfDir) => {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val edges = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 2)
        .select(col("a"), col("b"), expr("100 div s_ab").as("w"))
        .localCheckpoint(true) // feeds the source row and all 4 rounds
      val adj = edges.select(col("a").as("u"), col("b").as("v"), col("w"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v"), col("w")))
      var dist = edges.agg(min(col("a")).as("node"))
        .withColumn("d", lit(0L))
        .localCheckpoint(true)
      for (_ <- 1 to 4) {
        val relax = dist.join(adj, dist("node") === adj("u"))
          .select(adj("v").as("node"), (dist("d") + adj("w")).as("d"))
        dist = dist.unionByName(relax)
          .groupBy("node").agg(min(col("d")).as("d"))
          .localCheckpoint(true)
      }
      val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      val out = dist.orderBy(col("d"), col("node")).limit(20)
        .localCheckpoint(true)
      mine.values.foreach(_.unpersist(blocking = false))
      out
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS (
          SELECT node, min(d) AS d FROM (
            SELECT node, d FROM d${i - 1}
            UNION ALL
            SELECT adj.v AS node, d${i - 1}.d + adj.w AS d
            FROM d${i - 1} JOIN adj ON adj.u = d${i - 1}.node)
          GROUP BY 1)"""
      }.mkString(",\n")
      s"""
      WITH items AS ($itemsSql),
      edges AS (SELECT a, b, 100 // s_ab AS w FROM ($pairsSql) WHERE s_ab >= 2),
      adj AS (
        SELECT a AS u, b AS v, w FROM edges
        UNION ALL SELECT b AS u, a AS v, w FROM edges),
      d0 AS (SELECT min(a) AS node, CAST(0 AS BIGINT) AS d FROM edges),
      $rounds
      SELECT node, d FROM d4 ORDER BY d, node LIMIT 20
    """
    })

  /** Modularity (Newman & Girvan 2004, public) of the co-purchase graph
    * under the p_brand partition — the standard "is this community
    * structure real" score for a labeled clustering:
    * Q = Σ_c (e_c/m − (d_c/2m)²). Everything is integer until the final
    * per-community arithmetic (edge and degree counts), so each
    * community's contribution is one exact divide+multiply per row; the
    * global Q is a window sum over the ~25-brand community table. Edge
    * labels come from two broadcast joins of the part dimension onto the
    * edge list — the fact side streams, the dimension broadcasts, the
    * per-community aggregates are map-side combined.
    */
  private val modularity = QueryDef(
    "q_modularity",
    (spark, sfDir) => {
      val edges = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 2).select("a", "b")
        .localCheckpoint(true) // feeds deg and both label joins
      val brand = Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_brand"))
      val labeled = edges
        .join(broadcast(brand.select(col("p_partkey").as("a"), col("p_brand").as("ca"))), "a")
        .join(broadcast(brand.select(col("p_partkey").as("b"), col("p_brand").as("cb"))), "b")
      val eIn = labeled.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in"))
      val deg = edges.select(col("a").as("v"))
        .unionByName(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val dC = deg
        .join(broadcast(brand.select(col("p_partkey").as("v"), col("p_brand").as("community"))), "v")
        .groupBy("community")
        .agg(count(lit(1)).as("n_nodes"), sum(col("dg")).as("d_c"))
      val mRow = edges.agg(count(lit(1)).as("m"))
      val out = dC.join(eIn, Seq("community"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(mRow))
        .withColumn("contribution",
          Ql.r(col("e_in").cast("double") / col("m")
            - (col("d_c").cast("double") / (lit(2L) * col("m")))
              * (col("d_c").cast("double") / (lit(2L) * col("m"))), 6))
      val wAll = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      out
        .withColumn("q_total", Ql.r(sum(col("contribution")).over(wAll), 4))
        .select(col("community"), col("n_nodes"), col("e_in"), col("d_c"),
          col("contribution"), col("q_total"))
        .orderBy("community")
    },
    Some(s"""
      WITH items AS ($itemsSql),
      edges AS (SELECT a, b FROM ($pairsSql) WHERE s_ab >= 2),
      brand AS (SELECT p_partkey, p_brand FROM part),
      labeled AS (
        SELECT ba.p_brand AS ca, bb.p_brand AS cb FROM edges
          JOIN brand ba ON ba.p_partkey = a
          JOIN brand bb ON bb.p_partkey = b),
      ein AS (SELECT ca AS community, count(*) AS e_in FROM labeled
              WHERE ca = cb GROUP BY 1),
      deg AS (
        SELECT v, count(*) AS dg FROM (
          SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
        GROUP BY 1),
      dc AS (
        SELECT p_brand AS community, count(*) AS n_nodes,
               CAST(sum(dg) AS BIGINT) AS d_c
        FROM deg JOIN brand ON p_partkey = v GROUP BY 1),
      m AS (SELECT count(*) AS m FROM edges),
      rows_ AS (
        SELECT community, n_nodes,
               CAST(coalesce(e_in, 0) AS BIGINT) AS e_in, d_c,
               ${Ql.R("""CAST(coalesce(e_in, 0) AS DOUBLE) / m.m
                 - (CAST(d_c AS DOUBLE) / (2 * m.m)) * (CAST(d_c AS DOUBLE) / (2 * m.m))""", 6)}
                 AS contribution
        FROM dc LEFT JOIN ein USING (community), m)
      SELECT community, n_nodes, e_in, d_c, contribution,
             ${Ql.R("sum(contribution) OVER ()", 4)} AS q_total
      FROM rows_ ORDER BY community
    """))

  /** 2-hop neighborhood closure size per part on the support≥3
    * co-purchase graph: |{u : dist(v,u) ≤ 2}|, the "friend-of-friend"
    * reach that seeds influence/recall estimates. Shape: symmetrize the
    * [[itemPairs]] edge set once, DEGREE-CAP the expansion pivots (only
    * mids with degree ≤ 100 relay a 2-hop path — the same hub-cap rule
    * the dedup family applies to shingles, applied IDENTICALLY in the
    * oracle so the cap is a shared definition, not an approximation),
    * then one mid-keyed self-join + a distinct + a per-src count. The
    * join fans out O(Σ deg(mid)²) over capped mids only — bounded at any
    * scale; without the cap one celebrity part would quadratically
    * dominate the shuffle. Top-20 by closure size (TakeOrderedAndProject).
    */
  private val graph2hop = QueryDef(
    "q_graph_2hop",
    (spark, sfDir) => {
      val pairs = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 3)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true) // feeds degrees + both sides of the 2-hop join
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val relay = deg.filter(col("d") <= 100).select(col("src").as("mid"))
      // relay is node-sized (grows with the catalog) — a keyed semi-shape
      // join, NOT a broadcast
      val twoHop = edges.select(col("src"), col("dst").as("mid"))
        .join(relay, "mid")
        .join(edges.select(col("src").as("mid"), col("dst").as("d2")), "mid")
        .filter(col("src") =!= col("d2"))
        .select(col("src"), col("d2").as("reach"))
        .unionByName(edges.select(col("src"), col("dst").as("reach")))
        .distinct()
      twoHop.groupBy("src").agg(count(lit(1)).as("n_reach"))
        .join(deg, "src")
        .select(col("src").as("part"), col("d").as("degree"), col("n_reach"))
        .orderBy(col("n_reach").desc, col("part"))
        .limit(20)
    },
    Some(s"""
      WITH items AS ($itemsSql),
      pairs AS ($pairsSql),
      sup AS (SELECT a, b FROM pairs WHERE s_ab >= 3),
      edges AS (SELECT a AS src, b AS dst FROM sup
                UNION ALL SELECT b, a FROM sup),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
              FROM edges GROUP BY 1),
      relay AS (SELECT src AS mid FROM deg WHERE d <= 100),
      reach AS (
        SELECT DISTINCT src, reach FROM (
          SELECT e1.src, e2.dst AS reach
          FROM edges e1
            JOIN relay r ON e1.dst = r.mid
            JOIN edges e2 ON e1.dst = e2.src
          WHERE e1.src <> e2.dst
          UNION ALL
          SELECT src, dst FROM edges))
      SELECT g.src AS part, deg.d AS degree,
             CAST(g.n_reach AS BIGINT) AS n_reach
      FROM (SELECT src, count(*) AS n_reach FROM reach GROUP BY 1) g
        JOIN deg ON g.src = deg.src
      ORDER BY n_reach DESC, part
      LIMIT 20
    """))

  /** Recommender-quality audit of the q_item_cf top-10 lists: catalog
    * coverage (what share of recommendable items ever appears as a
    * neighbor), the Herfindahl concentration of neighbor appearances
    * (popularity bias — HHI needs no sorting, unlike a Gini, so it
    * stays one aggregation), and the cosine decay from rank 1 to rank
    * 10 (how fast list quality falls off). Audits the EXACT ranking
    * q_item_cf serves — both call the shared [[cfTopK]] definition, so
    * the audit cannot drift from the production lists; every audit
    * number comes from neighbor-catalog-sized aggregations, and
    * appearance shares are exact integer counts divided once at the
    * end.
    */
  private val recCoverage = QueryDef(
    "q_rec_coverage",
    (spark, sfDir) => {
      val topk = cfTopK(spark, sfDir)
        .localCheckpoint(true) // feeds the appearance and decay aggregations
      val catalog = orderItems(spark, sfDir)
        .agg(countDistinct("l_partkey").as("n_catalog"))
      val app = topk.groupBy("nbr").agg(count(lit(1)).as("ap"))
      val hhi = app.agg(sum("ap").as("tap"),
          sum(col("ap") * col("ap")).as("sap"),
          countDistinct("nbr").as("n_recommended"))
        .selectExpr("tap", "sap", "n_recommended",
          s"${Ql.R("CAST(sap AS DOUBLE) / (CAST(tap AS DOUBLE) * tap)", 6)} AS hhi")
      // conditional aggregation, not a join against a filtered frame: an
      // item set with no 10-deep list must yield a NULL mean, not an
      // empty report (the empty-d10 cross-join collapse)
      val decay = topk.agg(
        Ql.r(avg(when(col("rank") === 1, col("cosine"))), 4).as("mean_cos_r1"),
        Ql.r(avg(when(col("rank") === 10, col("cosine"))), 4).as("mean_cos_r10"))
      hhi.crossJoin(broadcast(catalog))
        .crossJoin(broadcast(decay))
        .selectExpr("n_catalog", "n_recommended",
          s"${Ql.R("100.0 * n_recommended / n_catalog", 2)} AS coverage_pct",
          "hhi", "mean_cos_r1", "mean_cos_r10")
    },
    Some(s"""
      WITH $cfTopKSql,
      cat AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_catalog FROM items),
      app AS (SELECT nbr, CAST(count(*) AS BIGINT) AS ap FROM topk GROUP BY 1),
      h AS (
        SELECT CAST(sum(ap) AS BIGINT) AS tap,
               CAST(sum(ap * ap) AS BIGINT) AS sap,
               CAST(count(DISTINCT nbr) AS BIGINT) AS n_recommended
        FROM app),
      d AS (
        SELECT ${Ql.R("avg(CASE WHEN rank = 1 THEN cosine END)", 4)} AS mean_cos_r1,
               ${Ql.R("avg(CASE WHEN rank = 10 THEN cosine END)", 4)} AS mean_cos_r10
        FROM topk)
      SELECT n_catalog, n_recommended,
             ${Ql.R("100.0 * n_recommended / n_catalog", 2)} AS coverage_pct,
             ${Ql.R("CAST(sap AS DOUBLE) / (CAST(tap AS DOUBLE) * tap)", 6)} AS hhi,
             mean_cos_r1, mean_cos_r10
      FROM h CROSS JOIN cat CROSS JOIN d
    """))

  /** Multi-source closeness centrality within a 4-hop horizon — the
    * "which catalog anchors sit closest to everything" landmark metric,
    * run as ONE joint Bellman-Ford over (source, node) keyed state
    * instead of a loop over sources (the landmark/pivot trick from
    * Potamias et al. 2009's closeness estimation: k sources cost one
    * k×-wider frontier, not k passes). Edge costs are the q_sssp
    * integers (100 div s_ab); distances stay exact BIGINTs through
    * every relaxation; the only doubles are the final 1/d harmonic
    * terms (harmonic closeness handles the unreached mass without a
    * disconnected-penalty convention). Same per-round localCheckpoint +
    * block-release hygiene as q_sssp; the oracle unrolls the four
    * rounds as chained CTEs.
    */
  private val closeness = QueryDef(
    "q_closeness",
    (spark, sfDir) => {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val edges = itemPairs(orderItems(spark, sfDir))
        .filter(col("s_ab") >= 2)
        .select(col("a"), col("b"), expr("100 div s_ab").as("w"))
        .localCheckpoint(true) // feeds the source rows and all 4 rounds
      val adj = edges.select(col("a").as("u"), col("b").as("v"), col("w"))
        .unionByName(edges.select(col("b").as("u"), col("a").as("v"), col("w")))
      var dist = edges.select(col("a")).distinct()
        .orderBy("a").limit(4)
        .select(col("a").as("src"), col("a").as("node"), lit(0L).as("d"))
        .localCheckpoint(true)
      for (_ <- 1 to 4) {
        val relax = dist.join(adj, dist("node") === adj("u"))
          .select(dist("src").as("src"), adj("v").as("node"),
            (dist("d") + adj("w")).as("d"))
        dist = dist.unionByName(relax)
          .groupBy("src", "node").agg(min(col("d")).as("d"))
          .localCheckpoint(true)
      }
      val mine = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      val out = dist.filter(col("d") > 0)
        .groupBy("src")
        .agg(count(lit(1)).as("n_reached"),
          sum("d").as("sum_dist"),
          Ql.r(sum(lit(1.0) / col("d")), 4).as("harmonic"))
        .orderBy("src")
        .localCheckpoint(true)
      mine.values.foreach(_.unpersist(blocking = false))
      out
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS (
          SELECT src, node, min(d) AS d FROM (
            SELECT src, node, d FROM d${i - 1}
            UNION ALL
            SELECT d${i - 1}.src, adj.v AS node, d${i - 1}.d + adj.w AS d
            FROM d${i - 1} JOIN adj ON adj.u = d${i - 1}.node)
          GROUP BY 1, 2)"""
      }.mkString(",\n")
      s"""
      WITH items AS ($itemsSql),
      edges AS (SELECT a, b, 100 // s_ab AS w FROM ($pairsSql) WHERE s_ab >= 2),
      adj AS (
        SELECT a AS u, b AS v, w FROM edges
        UNION ALL SELECT b AS u, a AS v, w FROM edges),
      srcs AS (SELECT DISTINCT a FROM edges ORDER BY a LIMIT 4),
      d0 AS (SELECT a AS src, a AS node, CAST(0 AS BIGINT) AS d FROM srcs),
      $rounds
      SELECT src, CAST(count(*) AS BIGINT) AS n_reached,
             CAST(sum(d) AS BIGINT) AS sum_dist,
             ${Ql.R("sum(1.0 / d)", 4)} AS harmonic
      FROM d4 WHERE d > 0 GROUP BY 1 ORDER BY src
    """
    })

  /** 3-truss peeling (Cohen 2008, public): drop every edge that closes
    * no triangle, twice — the cohesion filter one notch above k-core
    * (k-core keeps well-connected VERTICES; k-truss keeps well-supported
    * EDGES, killing bridge/star noise that survives coring). Per-edge
    * triangle support comes from the SAME degree-oriented wedge join as
    * q_triangle_count (O(m^1.5) bound), with each oriented triangle
    * mapped back to its three undirected edges and counted — never an
    * all-pairs step. Two unrolled rounds keep the oracle exact (the
    * loop-until-fixpoint variant is [[ktrussConverged]]); per-round
    * triangle totals fall out of Σsupport/3. The oracle enumerates
    * triangles with the plain id-ordered 3-join — independent
    * machinery, same semantics.
    */
  /** Per-edge triangle support of an id-ordered (a<b) undirected edge
    * list — the degree-oriented wedge join shared by q_ktruss and
    * [[ktrussConverged]]. Edges in zero triangles do NOT appear in the
    * output (groupBy over triangle sides), so "support < t" reads as an
    * anti/left join against this table. Internally localCheckpoints the
    * oriented list (consumed by three joins); callers that loop must
    * release persisted blocks themselves (the kcoreConverged pattern).
    */
  private[graft] def edgeSupport(edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val keyed = edges
      .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = keyed.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("kd"))
      .localCheckpoint(true)
    val o1 = oriented.select(col("src"), col("dst").as("d1"), col("kd").as("k1"))
    val o2 = oriented.select(col("src"), col("dst").as("d2"), col("kd").as("k2"))
    val tri = o1.join(o2, "src")
      .filter(col("k1") < col("k2") || (col("k1") === col("k2") && col("d1") < col("d2")))
      .join(oriented.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
      .select(col("src").as("x"), col("d1").as("y"), col("d2").as("z"))
    val sides = tri.select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .unionAll(tri.select(least(col("x"), col("z")).as("a"), greatest(col("x"), col("z")).as("b")))
      .unionAll(tri.select(least(col("y"), col("z")).as("a"), greatest(col("y"), col("z")).as("b")))
    sides.groupBy("a", "b").agg(count(lit(1)).as("sup"))
  }

  /** Convergence-loop k-truss (Cohen 2008): peel every edge with
    * triangle support < k−2 until a round removes nothing — the variant
    * a graph of unknown peel depth needs (the oracled q_ktruss keeps its
    * fixed 2-round contract because that is what the SQL twin can
    * express). Per-round shape is ONE [[edgeSupport]] wedge join + a
    * left join re-attaching support to the edge list, under the
    * kcoreConverged loop discipline: eager localCheckpoint per round so
    * Catalyst never re-analyzes accumulated lineage, convergence decided
    * on a 1-row aggregate, every persisted block released before
    * returning, loud failure past maxRounds. Termination: each non-final
    * round strictly removes ≥1 edge, so rounds ≤ |E|; the k-truss
    * fixpoint is unique (maximal subgraph with all edge supports ≥ k−2),
    * so the loop cannot stabilize on a wrong answer. For k=3 the loop
    * always fixes after one peel (removing a triangle-free edge cannot
    * destroy a triangle), which is exactly why q_ktruss's 2-round unroll
    * is exact there — PropertySpec proves loop == unroll for k=3 and
    * loop-past-2 on a k=4 cascade chain.
    *
    * Input `edges` must be the id-ordered (a<b) undirected pair list,
    * the q_ktruss convention. Returns (survivors(a, b, sup), peel rounds).
    */
  def ktrussConverged(edgesIn: org.apache.spark.sql.DataFrame, k: Int,
      maxRounds: Int = 50): (org.apache.spark.sql.DataFrame, Int) = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val t = (k - 2).toLong
    val sc = edgesIn.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var e = edgesIn.select("a", "b").localCheckpoint(true)
    var rounds = 0
    var converged = false
    var supported: org.apache.spark.sql.DataFrame = null
    // try/finally: the per-round checkpoint blocks must be released on the
    // non-convergence throw (and any mid-loop failure) too, not only on
    // the success path — a thrown loop must not leak blocks into the rest
    // of a bench session. `doomed` is pinned BEFORE the result's own
    // checkpoint so the finally never releases the survivors' blocks.
    var doomed: Set[Int] = Set.empty
    try {
      while (!converged && rounds < maxRounds) {
        // left join: edges in zero triangles are absent from edgeSupport's
        // output and must read as sup=0, not silently survive
        supported = e.join(edgeSupport(e), Seq("a", "b"), "left")
          .select(col("a"), col("b"), coalesce(col("sup"), lit(0L)).as("sup"))
          .localCheckpoint(true)
        val Array(nEdges, nKept) = supported
          .agg(count(lit(1)), sum(when(col("sup") >= t, 1L).otherwise(0L)))
          .head().toSeq.map(v => if (v == null) 0L else v.asInstanceOf[Long]).toArray
        if (nKept == nEdges) converged = true
        else {
          e = supported.filter(col("sup") >= t).select("a", "b")
            .localCheckpoint(true)
          rounds += 1
        }
      }
      if (!converged) {
        doomed = sc.getPersistentRDDs.keySet.toSet -- before
        throw new IllegalStateException(s"k-truss did not converge in $rounds rounds")
      }
      // pin the loop's blocks BEFORE the final checkpoint so the result's
      // own fresh blocks survive the finally's release (the recall pattern)
      doomed = sc.getPersistentRDDs.keySet.toSet -- before
      val out = supported.localCheckpoint(true)
      (out, rounds)
    } finally {
      // on a mid-loop throw `doomed` is still empty — release everything
      // created since `before`; on the planned paths it excludes `out`
      val ids = if (doomed.nonEmpty) doomed
        else sc.getPersistentRDDs.keySet.toSet -- before
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (ids(id)) rdd.unpersist(blocking = false)
      }
    }
  }

  private val ktruss: QueryDef = {
    QueryDef(
      "q_ktruss",
      (spark, sfDir) => {
        val e0 = itemPairs(orderItems(spark, sfDir))
          .filter(col("s_ab") >= 2).select("a", "b")
          .localCheckpoint(true)
        val s1 = edgeSupport(e0).localCheckpoint(true)
        val e1 = s1.filter(col("sup") >= 1).select("a", "b").localCheckpoint(true)
        val s2 = edgeSupport(e1).localCheckpoint(true)
        def roundRow(r: Int, in: org.apache.spark.sql.DataFrame,
            sup: org.apache.spark.sql.DataFrame) =
          in.agg(count(lit(1)).as("n_edges_in"))
            .crossJoin(broadcast(sup.agg(
              coalesce(expr("sum(sup) div 3"), lit(0L)).as("n_triangles"),
              coalesce(sum((col("sup") >= 1).cast("long")), lit(0L)).as("n_kept"))))
            .selectExpr(s"$r AS round", "n_edges_in", "n_triangles", "n_kept")
        roundRow(1, e0, s1).unionByName(roundRow(2, e1, s2)).orderBy("round")
      },
      Some(s"""
        WITH items AS ($itemsSql),
        e0 AS (SELECT a, b FROM ($pairsSql) WHERE s_ab >= 2),
        t1 AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
        s1 AS (
          SELECT a, b, count(*) AS sup FROM (
            SELECT x AS a, y AS b FROM t1
            UNION ALL SELECT x, z FROM t1
            UNION ALL SELECT y, z FROM t1)
          GROUP BY 1, 2),
        e1 AS (SELECT a, b FROM s1 WHERE sup >= 1),
        t2 AS (
          SELECT x1.a AS x, x1.b AS y, x2.b AS z
          FROM e1 x1 JOIN e1 x2 ON x1.b = x2.a
            JOIN e1 x3 ON x3.a = x1.a AND x3.b = x2.b),
        s2 AS (
          SELECT a, b, count(*) AS sup FROM (
            SELECT x AS a, y AS b FROM t2
            UNION ALL SELECT x, z FROM t2
            UNION ALL SELECT y, z FROM t2)
          GROUP BY 1, 2)
        SELECT 1 AS round,
               (SELECT count(*) FROM e0) AS n_edges_in,
               COALESCE((SELECT CAST(sum(sup) AS BIGINT) // 3 FROM s1), 0) AS n_triangles,
               COALESCE((SELECT count(*) FROM s1 WHERE sup >= 1), 0) AS n_kept
        UNION ALL
        SELECT 2 AS round,
               (SELECT count(*) FROM e1) AS n_edges_in,
               COALESCE((SELECT CAST(sum(sup) AS BIGINT) // 3 FROM s2), 0) AS n_triangles,
               COALESCE((SELECT count(*) FROM s2 WHERE sup >= 1), 0) AS n_kept
        ORDER BY round
      """))
  }

  override def defs: Seq[QueryDef] =
    Seq(pagerank, marketBasket, triangleCount, itemCf, itemsets3, rfmSegments,
      hits, assortativity, degreeHist, kcore, linkPred, sssp, modularity,
      graph2hop, recCoverage, closeness, ktruss)
}
