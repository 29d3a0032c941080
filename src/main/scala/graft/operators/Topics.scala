package graft.operators

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus topic modeling (LDA) — the unsupervised domain-discovery
  * step a mixture designer runs before assigning source weights
  * ("what is actually IN this crawl?"), and the capability kiara's
  * language-processing plugin exposes as topic modeling
  * (kiara_plugin.language_processing: tokenize → LDA topics).
  *
  * Spark-first shape: MLlib's distributed EM LDA over CountVectorizer
  * term vectors — both are map-side-friendly (the vocabulary is
  * fitted once and broadcast; EM iterations aggregate sufficient
  * statistics per partition). Output is the topic → top-terms table,
  * decoded by joining `describeTopics`' term INDICES against the
  * vocab table (posexplode + equi-join on the index — no UDF and no
  * driver-side vocabulary loop).
  *
  * Registered rows-only: topic-term weights are iterative float
  * estimates with no cross-engine twin; the spec pins stable topic
  * membership and separation on a planted two-vocabulary corpus
  * (within-topic rank order can flip on float-aggregation-order noise
  * when term weights tie exactly).
  */
object Topics {

  /** Frequent itemsets of ANY size via MLlib FPGrowth — the general-k
    * miner past `Basket`'s bounded pair/triple explodes (those cap the
    * itemset arity by construction; FP-growth's conditional-tree
    * recursion does not). Deterministic: FP-growth enumerates the
    * exact frequent-itemset lattice, no sampling — so the counts are
    * true support counts, cross-checked in the spec against the SQL
    * pair counts. Registered rows-only because arbitrary-arity itemset
    * enumeration has no tractable SQL twin.
    *
    * Scale shape: the same single-shuffle basket fold feeds FPGrowth's
    * parallel conditional trees (each partition mines its projected
    * prefix trees; only itemset counts shuffle). */
  def fpGrowth(lineitem: DataFrame, part: DataFrame, minSupport: Double = 0.02): DataFrame = {
    import org.apache.spark.ml.fpm.FPGrowth
    val baskets = Basket.brandBaskets(lineitem, part)
    val model = new FPGrowth()
      .setItemsCol("brands").setMinSupport(minSupport).setMinConfidence(0.5)
      .fit(baskets)
    model.freqItemsets
      .select(concat_ws(",", array_sort(col("items"))).as("itemset"),
        size(col("items")).cast("long").as("arity"), col("freq"))
      .orderBy("arity", "itemset")
  }

  def topicsLda(docs: DataFrame, k: Int = 4, vocabSize: Int = 2000,
                maxIter: Int = 30, topTerms: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"),
      array_remove(split(lower(col("text")), "[^a-z0-9]+"), "").as("words"))
    val cv = new CountVectorizer()
      .setInputCol("words").setOutputCol("features")
      .setVocabSize(vocabSize)
      .fit(toks)
    val model = new LDA()
      .setK(k).setSeed(42L).setMaxIter(maxIter).setOptimizer("em")
      .fit(cv.transform(toks))
    val vocab = spark.createDataFrame(
      cv.vocabulary.zipWithIndex.map { case (t, i) => (i, t) }.toSeq)
      .toDF("term_idx", "term")
    model.describeTopics(topTerms)
      .select(col("topic").cast("long").as("topic"),
        posexplode(col("termIndices")).as(Seq("rank", "term_idx")))
      .join(broadcast(vocab), "term_idx") // vocab-sized: always broadcastable
      .select(col("topic"), (col("rank") + 1).cast("long").as("rank"), col("term"))
      .orderBy("topic", "rank")
  }
}
