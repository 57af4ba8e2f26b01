package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the training-data-pipeline operator suite (dedup, similarity
  * search, text analysis, multimodal) — first-class alongside SURVEY.md §2.3.
  */
object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.queries ++ SpanDedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ Sampling.queries ++
      Curation.queries ++ Embeddings.queries ++ Mixture.queries ++
      HeavyHitters.queries ++ Profiling.queries ++ Layout.queries ++
      Retrieval.queries ++ Tokenizer.queries ++ Winnowing.queries ++
      EntityResolution.queries ++ DataQuality.queries ++ LineClean.queries

  val oracles: Map[String, String] =
    Dedup.oracles ++ SpanDedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ Sampling.oracles ++
      Curation.oracles ++ Embeddings.oracles ++ Mixture.oracles ++
      HeavyHitters.oracles ++ Profiling.oracles ++ Layout.oracles ++
      Retrieval.oracles ++ Tokenizer.oracles ++ Winnowing.oracles ++
      EntityResolution.oracles ++ DataQuality.oracles ++ LineClean.oracles
}
