import org.apache.spark.sql.execution.ExplainMode
val spark2 = graft.GraftSession.local("plans", "32")
val d = "/root/testdata/sf0.001"
val names = graft.queries.Catalog.plannedNames
val sb = new StringBuilder
sb.append("# PLANS - formatted physical plans of the headline queries\n\n")
sb.append("Generated from the live Catalyst output at sf0.001 (plan shape is\n")
sb.append("SF-independent; AQE re-optimizes sizes at runtime). Regenerate with\n")
sb.append("`tools/regen_plans.sh` after the last code commit of a round;\n")
sb.append("`PlansDocSpec` fails when any section here drifts from the live\n")
sb.append("operator tree. The properties these plans exhibit are pinned by\n")
sb.append("`PlanSpec`: pushed filters + pruned columns at the scan, broadcast\n")
sb.append("dimension joins, single-exchange aggregations, no cartesian\n")
sb.append("products, and `dot_d` fused into whole-stage codegen.\n")
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
