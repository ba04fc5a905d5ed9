package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: quality scoring,
  * language ID, token counting, fingerprinting. All map-only column
  * programs — no shuffles except the final dedup-group aggregations —
  * and all expressible in portable SQL so they're oracle-checkable.
  */
object TextAnalysis {

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "los", "y", "en", "es")
  val FrStop: Seq[String] = Seq("le", "la", "de", "les", "et", "en", "est")

  private def stopHits(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(stops)))

  /** Quality metrics per document: char/word/unique-word counts,
    * stopword count, type-token ratio as the quality proxy.
    */
  def quality(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(words).as("n_words"),
      size(array_distinct(words)).as("n_uniq"),
      stopHits(words, EnStop).as("stop_cnt"))
      .withColumn("ttr", col("n_uniq").cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_words"))
      .orderBy("doc_id")
  }

  /** N-gram-free language ID heuristic: stopword-list voting with a
    * deterministic argmax (ties broken by list order en > es > fr,
    * 'und' when no list scores). A real model slots in behind the same
    * column contract.
    */
  def langId(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    val sEn = stopHits(words, EnStop)
    val sEs = stopHits(words, EsStop)
    val sFr = stopHits(words, FrStop)
    docs.select(col(idCol).as("doc_id"),
        sEn.as("s_en"), sEs.as("s_es"), sFr.as("s_fr"))
      .withColumn("lang_pred",
        when(col("s_en") === 0 && col("s_es") === 0 && col("s_fr") === 0, "und")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation) — the standard
    * "how many tokens will this cost" estimator shape.
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).as("bpe_tokens"))
      .orderBy("doc_id")

  /** Content fingerprint: md5 over whitespace-normalized lowercase
    * text — the canonical near-exact dedup key (catches case and
    * spacing variants that `DocDedup.exact` misses).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        md5(lower(regexp_replace(col(textCol), "\\s+", " "))).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .orderBy("keep_id")
}
