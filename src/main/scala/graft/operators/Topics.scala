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
  * estimates with no cross-engine twin; the spec pins determinism
  * (fixed seed) and separation on a planted two-vocabulary corpus.
  */
object Topics {

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
