package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkTestBase

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("connectedComponents: chains, triangles, singletons") {
    // components: {1,2,3} (chain), {5,6} (edge), {9} (singleton)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("connectedComponents: long chain needs multiple propagation rounds") {
    val n = 12
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val nodes = (1 to n).map(_.toLong).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .collect().map(r => r.getLong(1)).toSet
    assert(out == Set(1L)) // everything collapses to the min label
  }

  test("dedupedCorpus: keeps cluster minimum + unpaired docs") {
    val docs = Seq(
      (0L, "spark shuffles data across the cluster during wide transformations always"),
      (1L, "spark shuffles data across the cluster during wide transformations always"),
      (2L, "completely unrelated text about cooking pasta with fresh tomatoes basil")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupedCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L)) // doc 1 folded into doc 0's cluster
  }

  test("connectedComponents: empty pair set leaves all singletons") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L).toDF("doc_id")
    val out = Dedup.connectedComponents(pairs, nodes, "doc_id")
      .filter(col("id") =!= col("component"))
    assert(out.count() == 0)
  }
}
