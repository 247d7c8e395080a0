package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation. Crawl-scale pipelines weight
  * and prioritize documents by the link structure of their sources (Common
  * Crawl publishes harmonic/PageRank host rankings; CCNet-class curation
  * consumes them as a quality prior), so the engine provides the
  * power-iteration primitive directly over an edge DataFrame.
  *
  * Scale design:
  *  - The edge list is normalized (distinct, self-loops dropped) and
  *    materialized ONCE with `localCheckpoint` — its lineage may be an
  *    extraction pipeline that must not re-run per iteration.
  *  - Each power iteration is exactly one src-keyed equi-join (edges x
  *    ranks) and one dst-keyed hash aggregate with map-side partial sums —
  *    the classic Pregel-on-DataFrames shape. The rank frame is |V| rows;
  *    nothing corpus-sized ever enters the loop.
  *  - Dangling mass (nodes with no out-edges) is collected with a 1-row
  *    aggregate and redistributed via a broadcast cross join — never a
  *    data-sized cross product.
  *  - Iterations are fixed and small (rank ordering stabilizes long before
  *    values converge); each round's ranks are rounded to `scale` decimals
  *    so results are independent of partial-aggregation order — the same
  *    cross-engine determinism discipline as [[Clustering.kmeans]].
  *
  * Ranks use the mean-1 normalization (sum over nodes = |V|, initial rank
  * 1.0): update r'(v) = (1-d) + d * (sum_{u->v} r(u)/outdeg(u) + D/|V|)
  * where D is the dangling mass. Magnitudes stay O(1), so fixed-decimal
  * rounding loses no signal at any graph size.
  */
object Graph {

  /** Power-iteration PageRank over an edge list. Returns (id, rank) for
    * every node that appears as a source or destination.
    *
    * @param edges0  edge DataFrame; duplicate edges and self-loops are
    *                dropped (a multigraph caller can pre-weight instead)
    * @param iters   fixed iteration count (no convergence probe — each
    *                probe is a driver round-trip; curation consumers want
    *                a deterministic plan, and ordering stabilizes early)
    * @param scale   per-iteration decimal rounding (determinism pin)
    */
  def pagerank(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85, scale: Int = 6): DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true)
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count().toDouble
    // (id, out_deg) with out_deg null for dangling nodes; |V| rows, reused
    // by every iteration, so materialize once
    val base = nodes.join(
        edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg")),
        Seq("id"), "left")
      .localCheckpoint(eager = true)

    var ranks = base.select(col("id"), lit(1.0).as("rank"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(base, Seq("id"))
      // 1-row dangling-mass aggregate (empty-filter-safe)
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling_mass"))
      val contribs = edges
        .join(withDeg.filter(col("out_deg").isNotNull)
            .select(col("id").as("src"),
              (col("rank") / col("out_deg")).as("share")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("contrib"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          round(lit(1.0 - damping) + lit(damping) *
              (coalesce(col("contrib"), lit(0.0)) +
                col("dangling_mass") / n),
            scale).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Personalized PageRank: teleport mass lands ONLY on the seed set
    * (uniformly), not on all nodes — the seed-based relevance/expansion
    * variant (crawl frontier prioritization from trusted hosts, related-
    * document scoring from a query set). Same iteration shape and cost as
    * [[pagerank]]; the seed set joins in once as a |seeds|-row frame.
    * Normalization: total mass stays |V| (seed teleport is (1-d)*|V|/|S|
    * per seed), so magnitudes and rounding behave identically.
    */
  def pagerankPersonalized(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3,
      damping: Double = 0.85, scale: Int = 6): DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true)
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count().toDouble
    val seedIds = seeds.select(col(seedCol).as("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
      .localCheckpoint(eager = true)
    val nSeeds = seedIds.count().toDouble
    require(nSeeds > 0, "personalized pagerank needs at least one seed node")
    val base = nodes.join(
        edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg")),
        Seq("id"), "left")
      .join(seedIds.withColumn("is_seed", lit(true)), Seq("id"), "left")
      .localCheckpoint(eager = true)
    // teleport vector: (1-d) * |V| / |S| on seeds, 0 elsewhere; dangling
    // mass also returns to the seeds (the standard PPR convention)
    val teleport = when(col("is_seed"), lit((1.0 - damping) * n / nSeeds))
      .otherwise(lit(0.0))
    var ranks = base.select(col("id"), lit(1.0).as("rank"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(base, Seq("id"))
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling_mass"))
      val contribs = edges
        .join(withDeg.filter(col("out_deg").isNotNull)
            .select(col("id").as("src"),
              (col("rank") / col("out_deg")).as("share")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("contrib"))
      ranks = base.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          round(teleport +
              lit(damping) * coalesce(col("contrib"), lit(0.0)) +
              when(col("is_seed"),
                lit(damping) * col("dangling_mass") / nSeeds)
                .otherwise(lit(0.0)),
            scale).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Degree profile of an edge list: per-node out/in degree (0 when the
    * node only appears on the other side). Two key aggregates + one |V|-row
    * outer join — the pre-flight report before choosing iteration counts
    * and skew caps for [[pagerank]].
    */
  def degreeStats(edges0: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val out = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
