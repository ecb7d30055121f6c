package graft.queries

import org.apache.spark.sql.functions._

/** Second-stage determinism probe: run the exact IndexManifestSpec
  * "killed LSH append" shape in a loop and compare the stored band
  * VALUES against a same-JVM rebuild — isolates whether the overlapped
  * parquet writes (not the reads) can corrupt values.
  * Run: sbt "Test/runMain graft.queries.ProfRace2 [seq]"
  */
object ProfRace2 {
  def main(args: Array[String]): Unit = {
    if (args.contains("seq")) System.setProperty("graft.overlap.sequential", "true")
    val s = graft.GraftSession.local("race2", "32")
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    import graft.sources.IndexManifest
    def doc(seed: Int): String = (1 to 12).map(i => s"w${seed}_$i").mkString(" ")
    val base = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val delta = Seq((11L, doc(7)), (12L, doc(8))).toDF("doc_id", "text")
    def tmp(p: String): String =
      "file://" + java.nio.file.Files.createTempDirectory(p).toString
    var bad = 0
    for (trial <- 1 to 10) {
      val dir = tmp("lsh-race")
      TextOps.writeLshIndex(base, dir)
      TextOps.stageLshAppend(delta, dir, 1L)
      TextOps.appendLshIndex(delta, dir)
      val rebuilt = tmp("lsh-race-reb")
      TextOps.writeLshIndex(base.unionByName(delta), rebuilt)
      def counts(d: String) = IndexManifest.readRewrite(s, d, "bucket_counts")
        .collect().map(r => (r.getInt(0), r.getStruct(1).toString) -> r.getLong(2)).toMap
      def recount(d: String) = IndexManifest.readAppendOnly(s, d, "bands")
        .groupBy($"band", $"bkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getStruct(1).toString) -> r.getLong(2)).toMap
      val (cd, cr) = (counts(dir), counts(rebuilt))
      val (rd, rr) = (recount(dir), recount(rebuilt))
      if (cd != cr) { bad += 1; println(s"PROBE trial $trial counts dir!=rebuilt") }
      if (rd != cd) { bad += 1; println(s"PROBE trial $trial dir bands!=counts") }
      if (rr != cr) { bad += 1; println(s"PROBE trial $trial rebuilt bands!=counts") }
      if (cd != cr && trial == 1) {
        (cd.keySet -- cr.keySet).take(2).foreach(k => println(s"PROBE only-dir $k"))
        (cr.keySet -- cd.keySet).take(2).foreach(k => println(s"PROBE only-reb $k"))
      }
    }
    println(s"PROBE2 done bad=$bad")
    s.stop()
  }
}
