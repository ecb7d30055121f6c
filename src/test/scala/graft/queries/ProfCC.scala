package graft.queries
import org.apache.spark.sql.functions._
/** Scratch probe: CC cost vs working-set partition count (round-14). */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val s2 = graft.GraftSession.local("ccprof", "32")
    s2.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import s2.implicits._
    graft.functions.GraftFunctions.registerDotD(s2)
    val docs = TextOps.fannedDocsOf(s2, d)
    val emb = graft.sources.Tables.embeddings(s2, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"text_hash")
    val ex = docs.withColumn("text_hash", md5($"text")).withColumn("rep", min($"doc_id").over(w))
      .filter($"doc_id" =!= $"rep").select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
    val dv = emb.join(docs.select($"doc_id"), $"vec_id" === $"doc_id").select($"vec_id", $"embedding")
    val edges = ex.union(TextOps.minhashPairs(TextOps.shinglesOfDf(docs)))
      .union(VectorOps.semanticPairs(dv))
      .localCheckpoint(true)
    println("PROF edges=" + edges.count())
    def t(tag: String)(f: => Long): Unit = {
      f; System.gc()
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    t("cc-p32") { TextOps.connectedComponentsStats(edges).labels.count }
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    t("cc-p4") { TextOps.connectedComponentsStats(edges).labels.count }
    s2.conf.set("spark.sql.shuffle.partitions", "1")
    t("cc-p1") { TextOps.connectedComponentsStats(edges).labels.count }
    s2.conf.set("spark.sql.shuffle.partitions", "32")
    t("cc-p32b") { TextOps.connectedComponentsStats(edges).labels.count }
    s2.stop()
  }
}
