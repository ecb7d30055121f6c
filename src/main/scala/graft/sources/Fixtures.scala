package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Typed readers for the reference's CSV/log event formats (SURVEY §2.1
  * S1-S3, §2.2 P1-P2). Each returns a `Dataset[Bean]`; the same schemas work
  * for `spark.readStream` file-replay (streaming) because the unified API
  * shares the DataFrame parse code.
  *
  * Scale notes: all parsing is codegen'd column expressions (`from_csv`-style
  * schema reads, `regexp_extract`, `to_timestamp`) — no UDFs, no driver-side
  * work; a directory of CSVs parallelizes by file split like any Spark scan.
  */
object Fixtures {

  /** Base directory of the repo-committed fixtures (`fixtures/apache.log`,
    * `fixtures/media_assets.parquet`). Defaults to `./fixtures` — the repo
    * root for sbt / spark-shell / the driver — and is overridable via
    * `-Dgraft.fixtures.dir=...` or `GRAFT_FIXTURES_DIR=...` for launches
    * whose working directory is not the repo root (e.g. spark-submit from
    * elsewhere). Read per call, not captured at object init, so a test
    * can retarget it.
    */
  def fixturesDir: String =
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .getOrElse("fixtures")

  /** Permissive CSV parse leaves nulls in unparseable numeric fields, which
    * would throw NOT_NULL_ASSERT_VIOLATION when deserialized into a bean
    * with primitive fields. Malformed rows are dropped instead (the
    * reference jobs would crash outright — Long.valueOf on a bad token —
    * so dropping is the strictly-more-robust choice for a library).
    */
  private def dropMalformed(df: DataFrame, required: String*): DataFrame =
    df.na.drop("any", required)

  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("itemId", LongType),
    StructField("categoryId", IntegerType),
    StructField("behavior", StringType),
    StructField("timestamp", LongType),
  ))

  /** HotItems.java:62-66 — positional CSV → UserBehavior (ts epoch s). */
  def userBehavior(s: SparkSession, path: String): Dataset[UserBehavior] = {
    import s.implicits._
    dropMalformed(s.read.schema(userBehaviorSchema).csv(path),
      "userId", "itemId", "categoryId", "timestamp").as[UserBehavior]
  }

  /** HotPages.java:51-56 — apache.log split-parse:
    * `ip - userId dd/MM/yyyy:HH:mm:ss +zone METHOD url`, ts → epoch millis.
    * Expressed as one whitespace split + to_timestamp (codegen) instead of
    * the reference's per-record SimpleDateFormat.
    */
  def apacheLog(s: SparkSession, path: String): Dataset[ApacheLogEvent] = {
    import s.implicits._
    s.read.text(path)
      .select(split(col("value"), " ").as("f"))
      .select(
        element_at($"f", 1).as("ip"),
        element_at($"f", 3).as("userId"),
        (unix_timestamp(to_timestamp(element_at($"f", 4), "dd/MM/yyyy:HH:mm:ss")) * 1000L)
          .as("timestamp"),
        element_at($"f", 6).as("method"),
        element_at($"f", 7).as("url"),
      )
      .as[ApacheLogEvent]
  }

  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("adId", LongType),
    StructField("province", StringType),
    StructField("city", StringType),
    StructField("timestamp", LongType),
  ))

  /** AdStatisticsByProvince.java:43-47 — AdClickLog.csv (ts epoch s). */
  def adClicks(s: SparkSession, path: String): Dataset[AdClickEvent] = {
    import s.implicits._
    dropMalformed(s.read.schema(adClickSchema).csv(path),
      "userId", "adId", "timestamp").as[AdClickEvent]
  }

  val loginSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("ip", StringType),
    StructField("loginState", StringType),
    StructField("timestamp", LongType),
  ))

  /** LoginFail.java:41-46 — LoginLog.csv (ts epoch s). */
  def logins(s: SparkSession, path: String): Dataset[LoginEvent] = {
    import s.implicits._
    dropMalformed(s.read.schema(loginSchema).csv(path),
      "userId", "timestamp").as[LoginEvent]
  }

  val orderSchema: StructType = StructType(Seq(
    StructField("orderId", LongType),
    StructField("eventType", StringType),
    StructField("txId", StringType),
    StructField("timestamp", LongType),
  ))

  /** OrderPayTimeOut.java:40-47 — OrderLog.csv (txId empty on create). */
  def orders(s: SparkSession, path: String): Dataset[OrderEvent] = {
    import s.implicits._
    dropMalformed(s.read.schema(orderSchema).csv(path), "orderId", "timestamp")
      .na.fill("", Seq("txId"))
      .as[OrderEvent]
  }

  val receiptSchema: StructType = StructType(Seq(
    StructField("txId", StringType),
    StructField("payChannel", StringType),
    StructField("timestamp", LongType),
  ))

  /** TxPayMatch.java:58-67 — ReceiptLog.csv (ts epoch s). */
  def receipts(s: SparkSession, path: String): Dataset[ReceiptEvent] = {
    import s.implicits._
    dropMalformed(s.read.schema(receiptSchema).csv(path),
      "txId", "timestamp").as[ReceiptEvent]
  }

  // ----- non-file sources (SURVEY §2.1 S2-S4) --------------------------

  /** The exact reader options [[kafkaCsv]] wires — exposed so the spec can
    * pin them even though this sandbox ships no Kafka connector jar or
    * broker (KafkaWiringSpec asserts the wiring reaches DataSource
    * resolution under the `kafka` format name and documents the missing
    * connector as the only gap).
    */
  def kafkaOptions(bootstrap: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> "latest",
  )

  /** The parse half of [[kafkaCsv]]: a raw line stream (any transport that
    * delivers a `value` column — Kafka after `CAST(value AS STRING)`, the
    * socket source, a MemoryStream in tests) → typed rows via `from_csv`.
    */
  def csvLines(lines: DataFrame, schema: StructType): DataFrame =
    lines
      .select(from_csv(col("value").cast("string"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.*"))

  /** Kafka line source (HotItems.java:51-58): value bytes → CSV parse with
    * the given schema. Streaming entry — returns the parsed DataFrame; the
    * caller picks the sink/trigger.
    */
  def kafkaCsv(
      s: SparkSession,
      bootstrap: String,
      topic: String,
      schema: StructType,
  ): DataFrame =
    csvLines(
      s.readStream
        .format("kafka")
        .options(kafkaOptions(bootstrap, topic))
        .load(),
      schema)

  /** Kafka producer data-loader (KafkaProducerUtil.java:27-47): write a
    * text file's lines to a topic in one batch.
    */
  def linesToKafka(s: SparkSession, path: String, bootstrap: String, topic: String): Unit =
    s.read.text(path) // text source yields the `value` column Kafka expects
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** Socket line source (HotPages.java:48) — demo/test only. */
  def socketLines(s: SparkSession, host: String, port: Int): DataFrame =
    s.readStream.format("socket").option("host", host).option("port", port).load()

  /** Deterministic generator standing in for the reference's random
    * SourceFunction (AppMarketingByChannel.java:60-91): rate source rows →
    * MarketingUserBehavior via hash-mixing the row counter (seeded, so
    * tests are reproducible — unlike the reference's Random()).
    */
  def marketingGenerator(s: SparkSession, rowsPerSec: Int = 10): Dataset[MarketingUserBehavior] = {
    import s.implicits._
    val behaviors = array(Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL").map(lit): _*)
    val channels = array(Seq("app store", "wechat", "weibo").map(lit): _*)
    s.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .load()
      .select(
        pmod(xxhash64(col("value"), lit(1)), lit(1000000L)).as("userId"),
        element_at(behaviors, (pmod(xxhash64(col("value"), lit(2)), lit(4)) + 1).cast("int"))
          .as("behavior"),
        element_at(channels, (pmod(xxhash64(col("value"), lit(3)), lit(3)) + 1).cast("int"))
          .as("channel"),
        (unix_timestamp(col("timestamp")) * 1000L).as("timestamp"),
      )
      .as[MarketingUserBehavior]
  }
}
