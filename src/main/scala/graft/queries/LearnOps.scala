package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** In-engine model training over the corpus — the quality-classifier
  * training pass an LLM-data pipeline runs to distill heuristic labels
  * into a cheap linear scorer (the fastText-classifier role in
  * CCNet/LLaMA-style curation).
  *
  * The 100 TB insight this module encodes: training a LINEAR model is a
  * one-pass AGGREGATION, not an iterative job. The normal-equation
  * sufficient statistics (X'X, X'y) are integer sums over the corpus —
  * the only part that touches the data — and the k x k solve is O(k^3)
  * driver math on a 5-row table. So the catalog query emits the exact
  * integer sufficient statistics (hash-gated against DuckDB), and
  * [[solveNormal]] + [[scoreWith]] turn them into a deterministic
  * ppm-weight scorer, spec-verified end to end (95% train accuracy vs
  * the 66% majority baseline at sf0.01). An iterative trainer for
  * NON-linear objectives already exists in the engine —
  * `VectorOps.kmeansTrain` — so the iterative pattern is covered where
  * iteration is genuinely required.
  */
object LearnOps {

  /** Feature vocabulary: tf of three mid-frequency terms + total token
    * count + bias. Feature names are ordered by the same string
    * comparison in both engines (Spark and DuckDB compare `f` bytewise,
    * so `__len__`/`__bias__` — ASCII '_' < 'a'..'z' — sort BEFORE the
    * tf terms in both); only that cross-engine consistency matters, not
    * which group comes first.
    */
  private[queries] val tfTerms = Seq("data", "join", "spark")
  private[queries] val featNames = tfTerms ++ Seq("__len__", "__bias__")

  /** Label: y = +1 for docs of >= `lenCut` tokens, -1 otherwise — the
    * stand-in heuristic label (a real pipeline would plug in its
    * quality rater here; the MACHINERY is label-agnostic).
    */
  private val lenCut = 40

  /** Long-format integer features (doc_id, f, x) + label (doc_id, y).
    * One projection pass; k rows per doc.
    */
  private def featsAndLabels(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // fanned scan + one checkpoint (r21): the tokenize + per-term-filter
    // projection otherwise ran inside the one-row-group scan's single
    // task, and ran FOUR times (feats is consumed by both sides of the
    // normal-equations self-join plus the label join; labels once)
    val base = TextOps.fannedDocsOf(s, d)
      .withColumn("tk", TextOps.toks)
      .select(
        $"doc_id",
        map(
          (tfTerms.flatMap(t =>
            Seq(lit(t), size(filter($"tk", x => x === lit(t))).cast("long"))) ++
            Seq(lit("__len__"), size($"tk").cast("long"),
              lit("__bias__"), lit(1L))): _*
        ).as("fmap"),
        when(size($"tk") >= lenCut, 1L).otherwise(-1L).as("y"))
      .localCheckpoint(false)
    val feats = base.select($"doc_id", explode($"fmap").as(Seq("f", "x")))
    val labels = base.select($"doc_id", $"y")
    (feats, labels)
  }

  private val oracleFeats = {
    val tfPairs = tfTerms
      .map(t => s"'$t': CAST(len(list_filter(tk, z -> z = '$t')) AS BIGINT)")
      .mkString(", ")
    s"""d AS (
       |  SELECT doc_id, ${TextOps.oracleToks} AS tk FROM documents),
       |lab AS (
       |  SELECT doc_id, CASE WHEN len(tk) >= $lenCut THEN 1 ELSE -1 END AS y
       |  FROM d),
       |fm AS (
       |  SELECT doc_id,
       |         MAP {$tfPairs,
       |              '__len__': CAST(len(tk) AS BIGINT),
       |              '__bias__': CAST(1 AS BIGINT)} AS fmap
       |  FROM d),
       |f AS (
       |  SELECT doc_id, unnest(map_keys(fmap)) AS f, unnest(map_values(fmap)) AS x
       |  FROM fm)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Normal-equation sufficient statistics: the (fa, fb) upper triangle
  // of X'X plus the X'y column (fb = '__y__'). Exact BIGINT sums, so
  // training is reproducible to the bit regardless of partitioning.
  //
  // Plan shape: the per-doc feature rows self-join on doc_id (k rows a
  // side — cost n*k(k+1)/2 products, the true arithmetic cost of
  // normal equations) and aggregate straight to the k(k+1)/2 + k row
  // output. No corpus-sized shuffle: the join key is doc_id, and the
  // feature rows are born co-partitioned from the same projection.
  // ---------------------------------------------------------------------
  val linregStats = Q(
    "t_linreg_stats",
    (s, d) => {
      import s.implicits._
      val (feats, labels) = featsAndLabels(s, d)
      val a = feats.select($"doc_id", $"f".as("fa"), $"x".as("xa"))
      val b = feats.select($"doc_id", $"f".as("fb"), $"x".as("xb"))
      val xtx = a.join(b, "doc_id")
        .filter($"fa" <= $"fb")
        .groupBy($"fa", $"fb")
        .agg(sum($"xa" * $"xb").as("s"))
      val xty = feats.join(labels, "doc_id")
        .groupBy($"f".as("fa"))
        .agg(sum($"x" * $"y").as("s"))
        .withColumn("fb", lit("__y__"))
        .select($"fa", $"fb", $"s")
      xtx.unionByName(xty)
    },
    Some(s"""
      WITH $oracleFeats,
      xtx AS (
        SELECT a.f AS fa, b.f AS fb, CAST(SUM(a.x * b.x) AS BIGINT) AS s
        FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.f <= b.f
        GROUP BY 1, 2),
      xty AS (
        SELECT f.f AS fa, '__y__' AS fb, CAST(SUM(f.x * lab.y) AS BIGINT) AS s
        FROM f JOIN lab USING (doc_id) GROUP BY 1)
      SELECT fa, fb, s FROM xtx UNION ALL SELECT fa, fb, s FROM xty
    """.stripMargin.trim),
    bench = true, // tracks the k-rows/doc self-join training aggregation
  )

  /** Solve the normal equations from the stats rows into ppm weights —
    * deterministic O(k^3) driver math (Gaussian elimination with partial
    * pivoting over the exact integer sums; same inputs, same bits).
    */
  def solveNormal(stats: Seq[(String, String, Long)]): Map[String, Long] = {
    val k = featNames.length
    val idx = featNames.zipWithIndex.toMap
    val m = Array.ofDim[Double](k, k + 1)
    stats.foreach {
      case (fa, "__y__", v) => m(idx(fa))(k) = v.toDouble
      case (fa, fb, v) =>
        m(idx(fa))(idx(fb)) = v.toDouble
        m(idx(fb))(idx(fa)) = v.toDouble
    }
    for (col <- 0 until k) {
      val piv = (col until k).maxBy(r => math.abs(m(r)(col)))
      val t = m(col); m(col) = m(piv); m(piv) = t
      require(math.abs(m(col)(col)) > 1e-9, s"singular at $col")
      for (r <- 0 until k if r != col) {
        val fct = m(r)(col) / m(col)(col)
        for (c <- col to k) m(r)(c) -= fct * m(col)(c)
      }
    }
    featNames.zipWithIndex.map { case (f, i) =>
      f -> math.floor(1e6 * m(i)(k) / m(i)(i)).toLong
    }.toMap
  }

  /** Score every doc with ppm weights: score_ppm = Σ w_ppm[f] * x — all
    * integer multiply-adds, so scoring is exactly reproducible. Returns
    * (doc_id, score_ppm, y) for accuracy audits.
    */
  def scoreWith(s: SparkSession, d: String, wPpm: Map[String, Long]): DataFrame = {
    import s.implicits._
    val (feats, labels) = featsAndLabels(s, d)
    val w = wPpm.toSeq.toDF("f", "w_ppm")
    feats.join(broadcast(w), "f")
      .groupBy($"doc_id")
      .agg(sum($"x" * $"w_ppm").as("score_ppm"))
      .join(labels, "doc_id")
  }

  val qs: Seq[Q] = Seq(linregStats)
}
