package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over embedding columns
  * (north-star extension, SURVEY §2.1 ✚).
  *
  * Two paths:
  *  - brute-force cosine top-k: the exact baseline. The query set is small
  *    and broadcast, so the "cross join" is a broadcast-nested-loop over the
  *    corpus — embarrassingly parallel, no shuffle of the big side.
  *  - sign-bit LSH bucketed top-k: the scale path. Candidates are restricted
  *    to the query's hyperplane bucket; one broadcast equi-join on the bucket
  *    id instead of |Q|×|N| comparisons. Recall < 1 by design (classic ANN
  *    trade-off).
  *
  * Determinism: embeddings are quantized to integer milli-units before the
  * dot product (`quantize`). Integer sums are associative — the result is
  * independent of partitioning/evaluation order, so results are reproducible
  * across cluster sizes AND bit-identical to the DuckDB oracle (float
  * summation order would not be). Quantized int8/int16 embeddings are also
  * the standard memory/bandwidth optimization for ANN at scale.
  */
object Similarity {

  /** Quantize a float/double vector to integer units of 1/scale. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v.cast("array<double>"), x => round(x * scale).cast("long"))

  /** Exact integer dot product (order-independent). Built-in HOF form —
    * works on any session; the operators below use the codegen'd native
    * expression instead (see [[graft.expressions.QDotLong]]). */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Codegen'd native dot product; requires `GraftFunctions.register`. */
  private def nqdot(a: Column, b: Column): Column =
    call_function("graft_qdot", a, b)

  /** Cosine over quantized vectors: one double division of exact integer
    * dots — bit-identical on any engine. */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") / (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))

  /** Double-precision cosine (library use; order-sensitive last-ulp). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact cosine top-k neighbors for each row of `queries` against `corpus`.
    * `queries` is broadcast (small side); ranking is a window partitioned by
    * query id, so the per-query top-k never concentrates on one executor.
    * Self-matches excluded; ties broken by neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, scale: Int = 1000): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    // norms precomputed once per row, not once per pair
    val c = corpus.select(col(idCol).as("nbr_id"), quantize(col(vecCol), scale).as("nv"))
      .withColumn("nn", nqdot(col("nv"), col("nv")))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol), scale).as("qv"))
      .withColumn("qn", nqdot(col("qv"), col("qv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        nqdot(col("qv"), col("nv")).cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nn").cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** Sign-bit bucket id over the first `signBits` raw vector components
    * (axis-aligned hyperplane LSH). */
  def signBucket(v: Column, signBits: Int): Column =
    aggregate(
      zip_with(slice(v.cast("array<double>"), 1, signBits), sequence(lit(0), lit(signBits - 1)),
        (x, j) => when(x >= 0, pow(lit(2.0), j).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)

  /** IVF-structured approximate top-k: quantize the corpus into `nCells`
    * Voronoi cells around centroid vectors, then search only the query's
    * own cell. Cell assignment is an exact integer distance argmin
    * (d² = v·v − 2·v·c + c·c over quantized ints — associative, so
    * deterministic at any partitioning) against a BROADCAST centroid set;
    * the search is an equi-join on the cell id. This is the IVF index
    * *structure*; centroids here are seeded deterministically from the
    * first `nCells` corpus vectors (a future round can add Lloyd
    * iterations — the search path is unchanged). */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 16,
      scale: Int = 1000): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val cents = corpus.filter(col(idCol) < nCells)
      .select(col(idCol).as("cent_id"), quantize(col(vecCol), scale).as("cv"))
      .withColumn("cc", nqdot(col("cv"), col("cv")))
    def assign(df: DataFrame, id: String, v: String): DataFrame = {
      val scoredCells = df.join(broadcast(cents))
        .withColumn("d2",
          col("vv") - lit(2) * nqdot(col(v), col("cv")) + col("cc"))
      val w = Window.partitionBy(col(id)).orderBy(col("d2"), col("cent_id"))
      scoredCells.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") === 1)
        .select(col(id), col(v), col("vv"), col("cent_id").as("cell"))
    }
    val c = assign(
      corpus.select(col(idCol).as("nbr_id"), quantize(col(vecCol), scale).as("nv"))
        .withColumn("vv", nqdot(col("nv"), col("nv"))), "nbr_id", "nv")
    val q = assign(
      queries.select(col(idCol).as("query_id"), quantize(col(vecCol), scale).as("qv"))
        .withColumn("vv", nqdot(col("qv"), col("qv"))), "query_id", "qv")
      .withColumnRenamed("vv", "qn")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        nqdot(col("qv"), col("nv")).cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("vv").cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: compare only within the query's
    * sign-bit bucket — a broadcast equi-join on the bucket id. */
  def bucketedTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, signBits: Int = 4,
      scale: Int = 1000): DataFrame = {
    graft.expressions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"),
      quantize(col(vecCol), scale).as("nv"), signBucket(col(vecCol), signBits).as("bucket"))
      .withColumn("nn", nqdot(col("nv"), col("nv")))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol), scale).as("qv"), signBucket(col(vecCol), signBits).as("bucket"))
      .withColumn("qn", nqdot(col("qv"), col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine",
        nqdot(col("qv"), col("nv")).cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nn").cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cosine", "rank")
  }
}
