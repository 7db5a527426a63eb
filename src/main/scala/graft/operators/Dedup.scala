package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication for large-scale text corpora (north-star extension,
  * SURVEY §2.1 ✚): exact, n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Scale design: every variant avoids the O(N²) cross join. Candidate pairs
  * come either from an inverted index on shingles (docs sharing ≥1 shingle)
  * or from LSH band buckets; both are plain shuffles on a key, so they
  * partition across executors and survive a 1000× scale-up. All hashing is
  * md5-based (codegen'd, no UDF) so the DuckDB oracle reproduces results
  * exactly.
  */
object Dedup {

  /** Exact dedup on a fingerprint of normalized text — one hash-agg shuffle
    * (map-side combine), the 100-TB-safe baseline. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol), Text.fingerprint(col(textCol)).as("fingerprint"))
    fp.groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** doc → distinct n-word shingle set (one row per doc, no explode yet). */
  private def shingled(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), Text.wordShingles(col(textCol), n).as("sh"))
      .withColumn("nsh", size(col("sh")))

  /** Candidate pairs via an inverted shingle index: explode shingles, self-join
    * on the shingle, count co-occurrences — only docs sharing ≥1 shingle meet.
    * Exact Jaccard = |A∩B| / (|A|+|B|−|A∩B|) from the co-occurrence count,
    * so no second pass over the shingle sets is needed. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val s = shingled(df, idCol, textCol, n)
    val ex = s.select(col("id"), col("nsh"), explode(col("sh")).as("shingle"))
    val a = ex.select(col("id").as("id_a"), col("nsh").as("nsh_a"), col("shingle"))
    val b = ex.select(col("id").as("id_b"), col("nsh").as("nsh_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("nsh_a"), col("nsh_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: element i = lexicographic min over shingles of
    * md5(i || ":" || shingle). Pure higher-order functions — one row per doc,
    * no shuffle to build signatures. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** MinHash + LSH near-dup pairs.
    * numHashes = bands * rowsPerBand; a pair is a candidate iff all rows of
    * some band agree (band key = md5 of the joined band slice). Candidates
    * are verified with exact Jaccard over the shingle sets. The only
    * shuffles are the band-bucket self-join and the verify joins — never a
    * cross join, so this is the scale path for corpus dedup. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    val s = shingled(df, idCol, textCol, n).filter(col("nsh") > 0)
    val sig = s.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sig.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          bi => md5(concat_ws("|", slice(col("sig"), bi * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .as(Seq("band", "band_key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val sets = s.select(col("id"), col("sh"), col("nsh"))
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("nsh").as("nsh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("nsh").as("nsh_b")), Seq("id_b"))
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash signatures: one 32-bit hash per doc; near-dups = pairs within
    * `maxHamming`. Candidates via banding the hash into 4 bytes (any equal
    * byte ⇒ candidate — guaranteed complete for maxHamming ≤ 3 by pigeonhole),
    * so again no cross join at scale. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "byte-banding is only complete for maxHamming <= 3")
    val h = df.select(col(idCol).as("id"), Text.simhash(col(textCol)).as("sh32"))
    val banded = h.select(col("id"), col("sh32"), posexplode(
        transform(sequence(lit(0), lit(3)),
          bi => pmod(floor(col("sh32") / pow(lit(2.0), bi * lit(8))), lit(256)).cast("long")))
      .as(Seq("band", "byte")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.byte") === col("y.byte") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("x.sh32").as("h_a"),
        col("y.id").as("id_b"), col("y.sh32").as("h_b"))
      .distinct()
    // popcount(xor) via 32 bit tests — codegen'd arithmetic, no UDF
    val ham = aggregate(
      transform(sequence(lit(0), lit(31)), j => {
        val ba = pmod(floor(col("h_a") / pow(lit(2.0), j)), lit(2))
        val bb = pmod(floor(col("h_b") / pow(lit(2.0), j)), lit(2))
        when(ba =!= bb, 1L).otherwise(0L)
      }),
      lit(0L), (acc, x) => acc + x)
    cand.withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup: sign-bit LSH buckets over the first `signBits`
    * components (axis-aligned hyperplanes), exact quantized cosine within a
    * bucket. Deterministic and oracle-reproducible; recall < 1 by design
    * (documented LSH trade-off), precision = 1 via the exact verify. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      signBits: Int = 8, threshold: Double = 0.4): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      Similarity.quantize(col(vecCol)).as("v"),
      Similarity.signBucket(col(vecCol), signBits).as("bucket"))
    val pairs = v.as("x").join(v.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("x.v").as("va"),
        col("y.id").as("id_b"), col("y.v").as("vb"))
    pairs.withColumn("cosine", Similarity.qcosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
