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
  * Scale design: baskets are exploded to DISTINCT (basket, attribute)
  * rows first — the attribute domain (brands: 25) caps per-basket fanout,
  * so the self-join's output is bounded by Σ basket_attrs², never
  * |rows|². The item table is persisted (self-joins recompute their
  * upstream subtree twice — CLAUDE.md); the pair aggregate is
  * domain²-sized; the 1-row basket total broadcasts. All lift math in
  * doubles — count×count in BIGINT would overflow exactly at the scale
  * where counts get interesting.
  */
object Basket {

  /** Brand pairs co-occurring in orders, with support ≥ `minSupport`
    * and lift; deterministic total order on the pair. */
  def coPurchase(lineitem: DataFrame, part: DataFrame, minSupport: Long = 50): DataFrame = {
    val items = lineitem.select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("okey"), col("p_brand").as("brand"))
      .distinct().persist()
    val nOrders = items.agg(countDistinct(col("okey")).as("n_orders"))
    val singles = items.groupBy("brand").agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.okey") === col("b.okey") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(singles.select(col("brand").as("brand_a"), col("cnt").as("cnt_a")), Seq("brand_a"))
      .join(singles.select(col("brand").as("brand_b"), col("cnt").as("cnt_b")), Seq("brand_b"))
      .crossJoin(broadcast(nOrders)) // bounded: 1 row
      .select(col("brand_a"), col("brand_b"), col("support"),
        (floor(col("support").cast("double") * col("n_orders")
            / (col("cnt_a").cast("double") * col("cnt_b")) * 10000.0 + 0.5)
          / 10000.0).as("lift"))
      .orderBy("brand_a", "brand_b")
  }
}
