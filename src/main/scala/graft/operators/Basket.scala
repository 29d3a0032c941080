package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the frequent-pairs core of association
  * mining ("customers who bought X also bought Y"): for every attribute
  * pair that shares a basket, the basket support count and the LIFT
  * (observed co-rate over the rate independence predicts; >1 means the
  * pair travels together). kiara analogue: the tabular query operators
  * over onboarded tables (/root/reference/src/kiara_plugin/tabular/
  * modules/table/__init__.py QueryTableSQL) — this is the canonical
  * self-join analytics query a kiara user would run there.
  *
  * Scale design: ONE shuffle on the basket key folds each basket into
  * its DISTINCT attribute set (the attribute domain — brands: 25 —
  * caps set size), and pairs are generated ROW-LOCALLY by a double
  * explode of that bounded set: output Σ basket_attrs², never |rows|²,
  * and the item stream is never re-shuffled for a self-join. The
  * basket table is persisted (it feeds three aggregates); the pair and
  * per-attribute aggregates are domain-sized; the 1-row basket total
  * broadcasts. All lift math in doubles — count×count in BIGINT would
  * overflow exactly at the scale where counts get interesting.
  */
object Basket {

  /** Brand pairs co-occurring in orders, with support ≥ `minSupport`
    * and lift; deterministic total order on the pair. */
  def coPurchase(lineitem: DataFrame, part: DataFrame, minSupport: Long = 50): DataFrame = {
    // ONE shuffle on the basket key folds each basket to its distinct
    // attribute set; pairs are then generated ROW-LOCALLY by a double
    // explode of the (domain-bounded) set — no self-join, so the item
    // stream is never shuffled a second and third time for the join
    val baskets = lineitem.select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("okey").agg(collect_set(col("p_brand")).as("brands"))
      .persist()
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val singles = baskets.select(explode(col("brands")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("cnt"))
    val pairs = baskets
      .select(explode(col("brands")).as("brand_a"), col("brands"))
      .select(col("brand_a"), explode(col("brands")).as("brand_b"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      // the per-attribute count table is attribute-domain-sized — always
      // broadcastable, whatever the corpus size
      .join(broadcast(singles.select(col("brand").as("brand_a"), col("cnt").as("cnt_a"))), Seq("brand_a"))
      .join(broadcast(singles.select(col("brand").as("brand_b"), col("cnt").as("cnt_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders)) // bounded: 1 row
      .select(col("brand_a"), col("brand_b"), col("support"),
        (floor(col("support").cast("double") * col("n_orders")
            / (col("cnt_a").cast("double") * col("cnt_b")) * 10000.0 + 0.5)
          / 10000.0).as("lift"))
      .orderBy("brand_a", "brand_b")
  }
}
