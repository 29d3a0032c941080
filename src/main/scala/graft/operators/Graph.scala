package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph analytics over edge tables. kiara ships network
  * analysis as a first-class plugin domain (kiara_plugin.network_analysis;
  * core hooks at /root/reference/src/kiara/models/values/value.py table
  * types) — connected components already exists for dedup clustering
  * (Dedup.clusters); PageRank is the other canonical iterative-join
  * workload, re-expressed Spark-first.
  *
  * Scale design: the static contribution table (edge + out-degree) is
  * computed once, repartitioned on the join key, and persisted — every
  * iteration then reuses the SAME co-partitioned input, so each round is
  * exactly one shuffle (the groupBy(dst) aggregation of contributions;
  * the ranks side is the only moving part). Lineage is truncated per
  * round with lazy localCheckpoint, the same idiom as Dedup.clusters:
  * constant plan depth regardless of iteration count, labels/ranks never
  * collected to the driver. The only driver-side scalar is N (node
  * count), needed for the teleport term.
  */
object Graph {

  /** Fixed-iteration PageRank: rank = (1-d)/N + d * sum(in-contrib).
    * `edges` is a directed (src, dst) table; parallel edges are collapsed
    * (each distinct edge contributes once — the standard formulation).
    * Nodes with no outbound edges contribute nothing (their mass leaks,
    * the simplified textbook variant); nodes with no INBOUND edges keep
    * the teleport term via the left join + coalesce(0).
    *
    * Output: (node, rank, rank_norm) where rank_norm = round(rank * N, 4)
    * — the N-scaled rank is O(1)-magnitude, which makes 4-decimal
    * rounding a meaningful tolerance for cross-engine float comparison
    * (raw ranks are O(1/N) and would vanish under absolute rounding).
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    // static across iterations: (src, dst, out_deg), co-partitioned on
    // src so each round's join with ranks(node) lines up shuffle-free
    val contrib = edges.join(outDeg, "src")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    contrib.count()
    edges.unpersist()
    val baseTerm = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val inbound = contrib.join(ranks, contrib("src") === ranks("node"))
        .groupBy(contrib("dst").as("node"))
        .agg(sum(col("rank") / col("out_deg")).as("m"))
      ranks = nodes.join(inbound, Seq("node"), "left")
        .select(col("node"),
          (lit(baseTerm) + lit(damping) * coalesce(col("m"), lit(0.0))).as("rank"))
        .localCheckpoint(false) // lazy: materialized by the next round's job
    }
    ranks
      .select(col("node"), col("rank"), round(col("rank") * n, 4).as("rank_norm"))
      .orderBy("node")
  }

  /** Customer↔supplier trade graph from orders ⋈ lineitem: node ids are
    * key*2 (customers) / key*2+1 (suppliers) so the two key spaces cannot
    * collide; each trading pair yields both edge directions, so every
    * node has in- AND out-degree (no dangling mass, no teleport-only
    * rows) — which also makes the fixed-iteration oracle well-behaved. */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
  }
}
