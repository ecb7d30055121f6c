package graft.queries
import org.apache.spark.sql.functions._

/** Reliable-checkpoint cost probe for the component resolver (run via
  * `sbt "Test/runMain graft.queries.ProfCkpt"`): the 25x sf0.1
  * all-duplicates replica's multimodal edge set resolved twice — default
  * `localCheckpoint` vs the executor-loss-safe `checkpointDir` mode —
  * so the reliable mode has a measured price, not just a parity spec.
  * Results: SCALING.md ("reliable-checkpoint CC cost").
  */
object ProfCkpt {
  def main(args: Array[String]): Unit = {
    val s2 = graft.GraftSession.local("ckptprof", "32")
    s2.sparkContext.setLogLevel("ERROR")
    import s2.implicits._
    graft.functions.GraftFunctions.registerDotD(s2)
    val d = "/root/testdata/sf0.1"
    val base = "/tmp/graft_mm25"
    val replicas = 25
    // ---- 25x replica of the two multimodal inputs (ids shifted by a
    // shared span; payloads NOT perturbed - the adversarial
    // all-duplicates regime of the round-11 sweep) ----
    val docs0 = graft.sources.Tables.documents(s2, d).select($"doc_id", $"text")
    val emb0 = graft.sources.Tables.embeddings(s2, d).select($"vec_id", $"embedding")
    val span = docs0.agg(max($"doc_id")).head().getLong(0) * 10
    def rep(df: org.apache.spark.sql.DataFrame, idc: String) =
      (0 until replicas).map(i => df.withColumn(idc, col(idc) + lit(i.toLong * span)))
        .reduce(_ unionByName _)
    val marker = java.nio.file.Paths.get(s"$base/_OK")
    if (!java.nio.file.Files.exists(marker)) {
      rep(docs0, "doc_id").repartition(32).write.mode("overwrite").parquet(s"$base/docs.parquet")
      rep(emb0, "vec_id").repartition(32).write.mode("overwrite").parquet(s"$base/emb.parquet")
      java.nio.file.Files.createFile(marker)
    }
    val docs = s2.read.parquet(s"$base/docs.parquet")
    val emb = s2.read.parquet(s"$base/emb.parquet")
    // ---- the flagship's three edge modalities, materialized once so
    // both CC modes time the SAME parquet-scanned input ----
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/edges.parquet/_SUCCESS"))) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"text_hash")
      val ex = docs.withColumn("text_hash", md5($"text"))
        .withColumn("rep", min($"doc_id").over(w))
        .filter($"doc_id" =!= $"rep").select($"rep".as("doc_a"), $"doc_id".as("doc_b"))
      val lex = TextOps.minhashPairs(TextOps.shinglesOfDf(docs))
        .select($"doc_a", $"doc_b")
      val dv = emb.join(docs.select($"doc_id"), $"vec_id" === $"doc_id")
        .select($"vec_id", $"embedding")
      val sem = VectorOps.semanticPairs(dv)
      ex.union(lex).union(sem).write.mode("overwrite").parquet(s"$base/edges.parquet")
    }
    val edges = s2.read.parquet(s"$base/edges.parquet")
    println(s"PROFCKPT edges=${edges.count()}")
    def time(tag: String, ckpt: Option[String]): Unit = {
      val times = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val r = TextOps.connectedComponentsStats(edges, 50, ckpt)
        val n = r.labels.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFCKPT $tag rep: $dt%.2f s rounds=${r.rounds} converged=${r.converged} labels=$n")
        dt
      }
      println(f"PROFCKPT $tag min=${times.min}%.2f s")
    }
    time("local", None)
    time("reliable", Some(s"$base/ckpt"))
    s2.stop()
  }
}
