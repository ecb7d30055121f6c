// Dump explain("formatted") for the r21 optimization targets to
// plans/r21/<query>_<tag>.txt. Usage:
//   spark-shell -cp target/scala-2.13/classes -i tools/dump_r21_plans.scala < /dev/null
// with env R21_TAG=before|after and optional R21_NAMES=a,b,c (default list below).
import org.apache.spark.sql.execution.ExplainMode
val tag = sys.env.getOrElse("R21_TAG", "before")
val defaultNames = Seq(
  "t_dedup_multimodal", "t_semantic_dedup", "t_neardup_clusters",
  "e_pagerank", "e_communities", "e_ppr_seeded", "e_bfs_hops",
  "t_curate_corpus", "v_cascade_search", "v_cascade_from_index",
  "e_zorder_scan", "v_kmeans_step", "v_ivf_assign", "t_minhash_lsh",
  "t_simhash_neardup", "t_clean_corpus", "t_rrf_fusion", "t_linreg_stats",
  "v_ivf_recall_trained", "hot_items_from_table", "t_boilerplate")
val names = sys.env.get("R21_NAMES").map(_.split(",").toSeq).getOrElse(defaultNames)
val spark2 = graft.GraftSession.local("plans-r21", "32")
val d = "/root/testdata/sf0.001"
new java.io.File("/root/repo/plans/r21").mkdirs()
names.foreach { n =>
  val df = graft.SparkEntry.queries(n)(spark2, d)
  val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
  java.nio.file.Files.write(
    java.nio.file.Paths.get(s"/root/repo/plans/r21/${n}_$tag.txt"),
    (txt + "\n").getBytes("UTF-8"))
  println(s"PROF wrote plans/r21/${n}_$tag.txt")
}
System.exit(0)
