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

  /** Sequential pattern mining (PrefixSpan, Pei et al. 2001) over
    * per-user event-type journeys — "which ordered behaviors recur
    * across users" (signup→click→purchase and friends), the sequence
    * twin of the FP-growth basket analysis above. kiara analogue: the
    * network/behavior analytics its plugin family targets
    * (/root/reference/src/kiara/interfaces/python_api/kiara_api.py:679
    * operation surface).
    *
    * Scale shape: one shuffle builds each user's time-ordered journey
    * (row_number + collect_list — journeys are CAPPED at `maxEvents`
    * per user, the standard guard because PrefixSpan's projected
    * database grows with sequence length, and a 100 TB log has users
    * with millions of events); MLlib's PrefixSpan then mines the
    * user-count-sized sequence table distributively. Canonical output:
    * the pattern as a ">"-joined string with its support count and
    * arity, totally ordered — deterministic for a fixed input (counts
    * are exact, no sampling). */
  def prefixSpan(events: DataFrame, minSupport: Double = 0.2,
                 maxPatternLength: Int = 3, maxEvents: Int = 20): DataFrame = {
    import org.apache.spark.ml.fpm.PrefixSpan
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seqs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxEvents)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("rn"), col("event_type")))).as("s"))
      .select(expr("transform(s, x -> array(x.event_type))").as("sequence"))
    new PrefixSpan()
      .setMinSupport(minSupport).setMaxPatternLength(maxPatternLength)
      .findFrequentSequentialPatterns(seqs)
      .select(
        concat_ws(">", expr("transform(sequence, x -> x[0])")).as("pattern"),
        size(col("sequence")).cast("long").as("arity"), col("freq"))
      .orderBy("arity", "pattern")
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
