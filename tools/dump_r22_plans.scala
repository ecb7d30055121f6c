// Dump explain("formatted") for the r22 optimization targets to
// plans/r22/<query>_<tag>.txt. Usage:
//   spark-shell -cp <classes-dir> -i tools/dump_r22_plans.scala < /dev/null
// with env R22_TAG=before|after, optional R22_NAMES=a,b,c and
// R22_OUT=<dir> (default /root/repo/plans/r22).
import org.apache.spark.sql.execution.ExplainMode
val tag = sys.env.getOrElse("R22_TAG", "after")
val outDir = sys.env.getOrElse("R22_OUT", "/root/repo/plans/r22")
val defaultNames = Seq(
  "t_erasure_cert", "t_erasure_cert_users", "t_index_catalog",
  "t_index_advisor", "t_index_fsck", "v_mmr_rerank",
  "m_audio_neardup", "m_asset_features",
  "t_neardup_clusters", "t_dedup_multimodal",
  "t_bm25_asof", "t_delta_neardup_day3", "e_cooccur_forget",
  "e_table_forget", "v_ivfpq_asof", "v_ivf_recall_trained")
val names = sys.env.get("R22_NAMES").map(_.split(",").toSeq).getOrElse(defaultNames)
val spark2 = graft.GraftSession.local("plans-r22", "32")
val d = "/root/testdata/sf0.001"
new java.io.File(outDir).mkdirs()
names.foreach { n =>
  val df = graft.SparkEntry.queries(n)(spark2, d)
  val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
  java.nio.file.Files.write(
    java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
    (txt + "\n").getBytes("UTF-8"))
  println(s"PROF wrote $outDir/${n}_$tag.txt")
}
System.exit(0)
