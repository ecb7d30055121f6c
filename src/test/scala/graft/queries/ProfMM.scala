package graft.queries
import org.apache.spark.sql.functions._
/** Stage-level profiler for the multimodal dedup flagship (run via
  * `sbt "Test/runMain graft.queries.ProfMM"`): times each edge modality,
  * the union resolver, and the full operator at sf0.1. This is how the
  * round-11 fan-out regression in the lexical branch was isolated
  * (SCALING.md "multimodal dedup profile").
  */
object ProfMM {
  def main(args: Array[String]): Unit = {
    val s2 = graft.GraftSession.local("mmprof", "32")
    s2.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import s2.implicits._
    def t(tag: String)(f: => Long): Unit = {
      f; System.gc()
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    graft.functions.GraftFunctions.registerDotD(s2)
    val docs = TextOps.fannedDocsOf(s2, d) // the catalog wiring (fan-out included)
    val emb = graft.sources.Tables.embeddings(s2, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"text_hash")
    t("exact-edges") {
      docs.withColumn("text_hash", md5($"text")).withColumn("rep", min($"doc_id").over(w))
        .filter($"doc_id" =!= $"rep").count
    }
    t("lex-edges") { TextOps.minhashPairs(TextOps.shinglesOfDf(docs)).count }
    val dv = emb.join(docs.select($"doc_id"), $"vec_id" === $"doc_id").select($"vec_id", $"embedding")
    t("sem-edges") { VectorOps.semanticPairs(dv).count }
    t("cc-union") {
      val ex = docs.withColumn("text_hash", md5($"text")).withColumn("rep", min($"doc_id").over(w))
        .filter($"doc_id" =!= $"rep").select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
      val lex = TextOps.minhashPairs(TextOps.shinglesOfDf(docs))
      val sem = VectorOps.semanticPairs(dv)
      TextOps.connectedComponentsStats(ex.union(lex).union(sem)).labels.count
    }
    t("full-op") { VectorOps.multimodalDedupOn(docs, emb).count }
    s2.stop()
  }
}
