package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function => callFn}
import org.apache.spark.sql.types.{DataType, LongType}


/** Bit-exact Spark-native replica of the reference's Bloom-filter UV
  * (NetworkFlowAnalysis/.../process/UvWithBloomFilter.java:95-161):
  * single polynomial hash `h = Σ h·seed + char` over `value.toString`,
  * masked to `cap − 1` (cap = 2^29 bits ≈ 64 MB bitmap in the reference's
  * Redis), distinct-offset count as the UV estimate.
  *
  * Where the reference keeps one external Redis bitmap per window and
  * round-trips GETBIT/SETBIT per event, this is a native Catalyst
  * [[TypedImperativeAggregate]]: per-partition partial bitmaps of used
  * offsets, merged on the reduce side — no external store, no per-event
  * network hop, and mergeable across 1000 executors. The buffer is a
  * COMPRESSED bitmap (RoaringBitmap — run/array/bitmap containers per
  * 2^16 chunk), so it is KBs when sparse and at most ~64 MB fully dense
  * (2^29 bits), never the GBs a boxed hash-set of offsets would reach at
  * the reference's 1e8-user scale; the counted value is identical
  * because the count equals the number of occupied bits in both designs.
  *
  * The Spark-idiomatic default for approximate UV remains
  * `approx_count_distinct` (HLL++, constant 2-4 KB buffers); this exists
  * for fidelity with the reference's published numbers (e.g. the
  * `uv_count[1511661600000] = 17414` checkpoint, README:544-550).
  */
final case class BloomUvAggregate(
    child: Expression,
    capBits: Int = 29,
    seed: Int = 61,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[org.roaringbitmap.RoaringBitmap] {

  require(capBits <= 31, s"capBits=$capBits: offsets must fit an Int for the bitmap")

  private val mask: Long = (1L << capBits) - 1

  /** UvWithBloomFilter.java:103-108, faithfully: Long overflow wraps the
    * same way Java's does.
    */
  def offsetOf(value: String): Long = {
    var result = 0L
    var i = 0
    while (i < value.length) { result = result * seed + value.charAt(i); i += 1 }
    result & mask
  }

  override def createAggregationBuffer(): org.roaringbitmap.RoaringBitmap =
    new org.roaringbitmap.RoaringBitmap()

  override def update(buffer: org.roaringbitmap.RoaringBitmap, input: InternalRow): org.roaringbitmap.RoaringBitmap = {
    val v = child.eval(input)
    // offsets are masked to < 2^capBits <= 2^31, so the Int cast is exact
    if (v != null) buffer.add(offsetOf(v.toString).toInt)
    buffer
  }

  override def merge(buffer: org.roaringbitmap.RoaringBitmap, other: org.roaringbitmap.RoaringBitmap): org.roaringbitmap.RoaringBitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: org.roaringbitmap.RoaringBitmap): Any = buffer.getLongCardinality

  override def serialize(buffer: org.roaringbitmap.RoaringBitmap): Array[Byte] = {
    buffer.runOptimize()
    val bb = ByteBuffer.allocate(buffer.serializedSizeInBytes())
    buffer.serialize(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): org.roaringbitmap.RoaringBitmap = {
    val bm = new org.roaringbitmap.RoaringBitmap()
    bm.deserialize(ByteBuffer.wrap(bytes))
    bm
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUvAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUvAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_uv"
}

/** Registration + Column API for graft's custom functions. */
object GraftFunctions {

  /** Registers `bloom_uv(col)`, `bloom_hash(col)`, `dot_d(a, b)`,
    * `topk_scored(key, cnt)` and `bounded_collect(id)` for SQL use.
    */
  def register(spark: SparkSession): Unit = {
    registerBloomHash(spark)
    registerDotD(spark)
    registerNfc(spark)
    registerDlDistance(spark)
    registerAggregators(spark)
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_uv"),
      new ExpressionInfo(classOf[BloomUvAggregate].getName, "bloom_uv"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"bloom_uv expects exactly 1 argument, got ${exprs.length}")
        BloomUvAggregate(exprs.head)
      },
    )
  }

  /** SQL names for the typed aggregators, with the catalog defaults
    * (top-5 ranking, 2^10 bucket cap): `topk_scored(key, cnt)` returns the
    * bounded per-group top-5 as an array of (key, cnt) structs;
    * `bounded_collect(id)` gathers up to 1024 ids and returns empty past
    * the cap (see [[TopKAggregator]] / [[BoundedCollectAggregator]]).
    *
    * `topk_scored` precondition: keys must be DISTINCT within the group
    * (feed it pre-aggregated (key, cnt) rows, as the catalog's
    * `hot_items_topk_agg` does). The aggregator does not dedup — two rows
    * with the same key are two independent candidates, so raw
    * un-aggregated rows can surface the same key twice in the top-5.
    */
  def registerAggregators(spark: SparkSession): Unit = {
    spark.udf.register("topk_scored",
      org.apache.spark.sql.functions.udaf(
        new TopKAggregator(5), org.apache.spark.sql.Encoders.product[Scored]))
    implicit val seqEnc =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    spark.udf.register("bounded_collect",
      org.apache.spark.sql.functions.udaf(
        new BoundedCollectAggregator[Long](1 << 10),
        org.apache.spark.sql.Encoders.scalaLong))
  }

  /** Column-API entry (requires [[register]] once per session). */
  def bloomUv(c: Column): Column = callFn("bloom_uv", c)

  /** Registers the scalar `bloom_hash(str)` (see [[BloomHashExpression]]). */
  def registerBloomHash(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_hash"),
      new ExpressionInfo(classOf[BloomHashExpression].getName, "bloom_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"bloom_hash expects exactly 1 argument, got ${exprs.length}")
        BloomHashExpression(org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.StringType))
      },
    )

  /** Column-API entry for the scalar hash. */
  def bloomHash(c: Column): Column = callFn("bloom_hash", c)

  /** Registers `dot_d(a, b)` (see [[DotProductDExpression]]) AND its
    * double-array sibling `dot_dd` (see [[DotProductDDExpression]] —
    * the SQ8 family scores decoded `array<double>` reconstructions, so
    * both live under the one registration every vector entry point
    * already calls). Idempotent — re-registration replaces the
    * identical builder, so query constructors call this unconditionally
    * to stay self-contained.
    */
  def registerDotD(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductDExpression].getName, "dot_d"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dot_d expects exactly 2 arguments, got ${exprs.length}")
        DotProductDExpression(exprs.head, exprs(1))
      },
    )
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_dd"),
      new ExpressionInfo(classOf[DotProductDDExpression].getName, "dot_dd"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dot_dd expects exactly 2 arguments, got ${exprs.length}")
        DotProductDDExpression(exprs.head, exprs(1))
      },
    )
  }

  /** Column-API entry for the codegen'd double-array dot product. */
  def dotDD(a: Column, b: Column): Column = callFn("dot_dd", a, b)

  /** Column-API entry for the codegen'd dot product. */
  def dotD(a: Column, b: Column): Column = callFn("dot_d", a, b)

  /** Registers `nfc(str)` (see [[NfcNormalizeExpression]]). Idempotent,
    * same contract as [[registerDotD]].
    */
  def registerNfc(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpression].getName, "nfc"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"nfc expects exactly 1 argument, got ${exprs.length}")
        NfcNormalizeExpression(exprs.head)
      },
    )

  /** Column-API entry for the codegen'd NFC normalizer. */
  def nfc(c: Column): Column = callFn("nfc", c)

  /** Registers `dl_distance(a, b)` (see [[DamerauLevenshteinExpression]]).
    * Idempotent, same contract as [[registerDotD]].
    */
  def registerDlDistance(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("dl_distance"),
      new ExpressionInfo(classOf[DamerauLevenshteinExpression].getName, "dl_distance"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"dl_distance expects exactly 2 arguments, got ${exprs.length}")
        DamerauLevenshteinExpression(exprs.head, exprs(1))
      },
    )

  /** Column-API entry for the codegen'd Damerau-Levenshtein distance. */
  def dlDistance(a: Column, b: Column): Column = callFn("dl_distance", a, b)

  /** Registers `sq8_pack(codes)` and `sq8_decode(codes, lo, hi)` — the
    * byte-packed SQ8 codec of the sq8 index family's format v2 (see
    * [[Sq8PackExpression]]/[[Sq8DecodeExpression]]). Idempotent, same
    * contract as [[registerDotD]].
    */
  def registerSq8(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("sq8_pack"),
      new ExpressionInfo(classOf[Sq8PackExpression].getName, "sq8_pack"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"sq8_pack expects exactly 1 argument, got ${exprs.length}")
        Sq8PackExpression(exprs.head)
      },
    )
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("sq8_decode"),
      new ExpressionInfo(classOf[Sq8DecodeExpression].getName, "sq8_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"sq8_decode expects exactly 3 arguments, got ${exprs.length}")
        Sq8DecodeExpression(exprs.head, exprs(1), exprs(2))
      },
    )
  }

  /** Column-API entry for the byte packer. */
  def sq8Pack(c: Column): Column = callFn("sq8_pack", c)

  /** Column-API entry for the fused unpack + reconstruction. */
  def sq8Decode(codes: Column, lo: Column, hi: Column): Column =
    callFn("sq8_decode", codes, lo, hi)
}
