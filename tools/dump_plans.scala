import org.apache.spark.sql.execution.ExplainMode
val spark2 = graft.GraftSession.local("plans", "32")
val d = "/root/testdata/sf0.001"
val names = Seq("q1_pricing_summary", "q3_shipping_priority", "hot_items_topn",
  "hot_items_topk_agg", "t_minhash_lsh", "t_clean_corpus", "v_knn_brute", "v_ivf_search",
  "e_funnel_relaxed")
val sb = new StringBuilder
sb.append("# PLANS - formatted physical plans of the headline queries\n\n")
sb.append("Generated from the live Catalyst output at sf0.001 (plan shape is\n")
sb.append("SF-independent; AQE re-optimizes sizes at runtime). Regenerate with\n")
sb.append("`spark-shell -cp target/scala-2.13/classes -i tools/dump_plans.scala`.\n")
sb.append("The properties these plans exhibit are pinned by `PlanSpec`:\n")
sb.append("pushed filters + pruned columns at the scan, broadcast dimension\n")
sb.append("joins, single-exchange aggregations, no cartesian products, and\n")
sb.append("`dot_d` fused into whole-stage codegen.\n")
names.foreach { n =>
  val df = graft.SparkEntry.queries(n)(spark2, d)
  sb.append(s"\n## $n\n\n```\n")
  sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
  sb.append("\n```\n")
}
java.nio.file.Files.write(java.nio.file.Paths.get("/root/repo/PLANS.md"),
  sb.toString.getBytes("UTF-8"))
println("PROF wrote PLANS.md " + sb.length + " chars")
System.exit(0)
