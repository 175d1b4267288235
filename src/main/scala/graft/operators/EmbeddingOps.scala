package graft.operators

import graft.sources.Tables
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding transformation layer: the preprocessing an ANN/dedup corpus
  * goes through before indexing — L2 normalization (pure codegen'd SQL,
  * so cosine becomes a plain dot product downstream) and PCA projection
  * (spark.ml: covariance aggregates DISTRIBUTED — one pass of d×d
  * partial Gram sums — and only the d×d eigen-solve happens on the
  * driver; the projection itself is again a map-side matrix-vector
  * product). At 100 TB the corpus is touched twice: once to fit, once to
  * project — both embarrassingly parallel, no shuffle beyond the fit's
  * single d²-sized aggregate. A 128→32 projection cuts every downstream
  * ANN scan's bytes 4× on top of whatever PQ does. */
object EmbeddingOps {

  /** L2-normalized copy of the embedding column (zero vectors pass
    * through unchanged rather than dividing by zero). */
  def normalized(emb: DataFrame, embCol: String = "embedding"): DataFrame = {
    graft.plans.VectorExpressions.register(emb.sparkSession)
    val norm = sqrt(graft.plans.VectorExpressions.dot(col(embCol), col(embCol)))
    emb.withColumn(embCol,
      when(norm > 0, transform(col(embCol), v => (v / norm).cast("float")))
        .otherwise(col(embCol)))
  }

  /** Fit a k-dim PCA on the corpus and project it: returns
    * (vec_id, embedding float[k]). Deterministic for a fixed corpus —
    * the eigen-solve is driver-local LAPACK on the exact covariance. */
  def pcaProject(spark: SparkSession, dir: String, k: Int): DataFrame = {
    implicit val s: SparkSession = spark
    val vecs = Tables(dir).embeddings
      .select(col("vec_id"), array_to_vector(col("embedding")).as("v"))
    val model = new PCA().setK(k).setInputCol("v").setOutputCol("p").fit(vecs)
    model.transform(vecs)
      .select(col("vec_id"),
        transform(vector_to_array(col("p")), x => x.cast("float")).as("embedding"))
  }
}
