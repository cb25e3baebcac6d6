package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates — the "sketch as a storable column" tier of
  * the approximate family (HLL distinct: `approx_count_distinct` /
  * `hll_sketch_agg`; quantiles: `percentile_approx`; membership: the Bloom
  * gate in Dedup). These cover frequency: a count-min sketch is a fixed
  * d×w grid of integer counters, so a 100 TB term-frequency question
  * shuffles d·w longs per partition instead of the full vocabulary, and
  * per-group sketches written to a table re-aggregate later (day → month)
  * WITHOUT re-reading the raw corpus — the pre-aggregated-cube pattern.
  *
  * Unlike engine-private sketch binaries, these counters are plain integers
  * under the repo's md5-derived hash family (NativeKernels.cmsBucket), so
  * every stage — build, merge, estimate — is bit-replayable by the DuckDB
  * oracle: the approximate tier itself is hash-checkable, not merely
  * rows-only + spec-bounded.
  *
  * Reference behavior anchored: the reference caps result set sizes and
  * pre-aggregates hot endpoints into materialized tables refreshed on a
  * schedule (crates/etl-serve statement budget + the mv refresh tasks);
  * sketch columns are the same pre-aggregation idea made mergeable.
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(depth > 0 && width > 0, s"cms_sketch: depth/width must be positive, got ($depth, $width)")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < depth) {
        buffer(i * width + NativeKernels.cmsBucket(term, i, width)) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

/** Element-wise sum of long vectors — the MERGE of stored CMS sketches (and
  * any other additive counter vector, e.g. histogram rows). Ragged inputs
  * throw: silently zip-truncating two different-shaped sketches would
  * corrupt every estimate downstream. NULL rows are skipped (a group with
  * no sketch contributes nothing); an all-NULL group returns NULL.
  */
case class LongVectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "long_vector_sum"

  // empty array = "no input seen yet" sentinel: the real vector length is
  // only known from the first row, and serialize(null) has no encoding
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer.isEmpty) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = arr.getLong(i); i += 1 }
      out
    } else {
      require(buffer.length == n,
        s"long_vector_sum: ragged input (${buffer.length} vs $n elements)")
      var i = 0
      while (i < n) { buffer(i) += arr.getLong(i); i += 1 }
      buffer
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (buffer.isEmpty) other
    else if (other.isEmpty) buffer
    else {
      require(buffer.length == other.length,
        s"long_vector_sum: ragged merge (${buffer.length} vs ${other.length} elements)")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LongVectorSumAgg =
    copy(child = newChildren.head)
}

/** Element-wise DOUBLE-accumulated sum of float vectors — the centroid
  * accumulator of Lloyd codebook training (r19): one grouped aggregate
  * replaces the posexplode → per-(group, pos) avg → re-collect two-shuffle
  * chain. Summation order is partial-aggregation order — exactly the
  * shuffle-order nondeterminism the codebook tiers already declare (their
  * oracles replay STORED codebooks, never the training fold). Ragged inputs
  * throw; NULL rows are skipped; an all-NULL group returns NULL.
  */
case class FloatVectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // an empty buffer means "no row seen yet": a zero-length input vector
    // would alias that state — the next k-dim row would silently
    // re-initialize instead of tripping the ragged require, and an
    // all-zero-dim group would eval to NULL like an all-NULL group. Vector
    // sums of zero-dim inputs have no consumer; fail fast instead.
    require(n > 0, "float_vector_sum: zero-length input vector")
    if (buffer.isEmpty) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = arr.getFloat(i).toDouble; i += 1 }
      out
    } else {
      require(buffer.length == n,
        s"float_vector_sum: ragged input (${buffer.length} vs $n elements)")
      var i = 0
      while (i < n) { buffer(i) += arr.getFloat(i).toDouble; i += 1 }
      buffer
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] =
    if (buffer.isEmpty) other
    else if (other.isEmpty) buffer
    else {
      require(buffer.length == other.length,
        s"float_vector_sum: ragged merge (${buffer.length} vs ${other.length} elements)")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FloatVectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FloatVectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FloatVectorSumAgg =
    copy(child = newChildren.head)
}

/** Growable flat-triangle state of [[GramAgg]]: four long accumulators per
  * upper-triangle dim pair (i ≤ j, 0-based), laid out at idx = j(j+1)/2 + i
  * — j-major, so growing the max dimension APPENDS slots without
  * re-indexing existing pairs (ragged inputs stay mergeable).
  */
final class GramBuffer(var d: Int, var n: Array[Long], var qq: Array[Long],
    var qi: Array[Long], var qj: Array[Long])

/** One-pass exact-integer GRAM accumulator over int8-quantized vectors
  * (r20): per upper-triangle dim pair (i ≤ j) the vector count, sum qi*qj
  * and the marginal sums — the Similarity.embedGram statistic WITHOUT the
  * d(d+1)/2-struct per-row explode (2080 interpreted-HOF struct
  * allocations per 64-dim vector, then a 4M-row shuffle at sf0.1): one
  * native loop accumulates the whole triangle into flat long arrays and
  * partials merge element-wise. The statistic is additive-integer, so any
  * accumulation order yields the same bits — identical to the exploded
  * form, which is why the hash-oracled rows stay green. Semantics mirror
  * the exploded form exactly: a NULL row contributes nothing, pair (i, j)
  * counts only vectors long enough to contain j (ragged corpora), and a
  * NULL element is counted in n but skipped by the sums it touches.
  * Output: array<struct<i, j, n, sum_qq, sum_qi, sum_qj>> (1-based dims,
  * pairs with n > 0), ready to explode.
  */
case class GramAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sum_qq", LongType, nullable = false),
    StructField("sum_qi", LongType, nullable = false),
    StructField("sum_qj", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"

  private def tri(d: Int): Int = d * (d + 1) / 2

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(0, Array.emptyLongArray, Array.emptyLongArray,
      Array.emptyLongArray, Array.emptyLongArray)

  private def grow(buf: GramBuffer, d: Int): Unit = {
    val t = tri(d)
    buf.n = java.util.Arrays.copyOf(buf.n, t)
    buf.qq = java.util.Arrays.copyOf(buf.qq, t)
    buf.qi = java.util.Arrays.copyOf(buf.qi, t)
    buf.qj = java.util.Arrays.copyOf(buf.qj, t)
    buf.d = d
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len == 0) return buf
    if (len > buf.d) grow(buf, len)
    var j = 0
    while (j < len) {
      val nullJ = arr.isNullAt(j)
      val qjv = if (nullJ) 0L else arr.getLong(j)
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val idx = base + i
        buf.n(idx) += 1L
        if (!arr.isNullAt(i)) {
          val qiv = arr.getLong(i)
          buf.qi(idx) += qiv
          if (!nullJ) buf.qq(idx) += qiv * qjv
        }
        if (!nullJ) buf.qj(idx) += qjv
        i += 1
      }
      j += 1
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    if (other.d == 0) return buf
    if (other.d > buf.d) grow(buf, other.d)
    val t = tri(other.d)
    var idx = 0
    while (idx < t) {
      buf.n(idx) += other.n(idx)
      buf.qq(idx) += other.qq(idx)
      buf.qi(idx) += other.qi(idx)
      buf.qj(idx) += other.qj(idx)
      idx += 1
    }
    buf
  }

  override def eval(buf: GramBuffer): Any = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j < buf.d) {
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val idx = base + i
        if (buf.n(idx) > 0L) {
          rows += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i + 1, j + 1, buf.n(idx), buf.qq(idx), buf.qi(idx),
              buf.qj(idx)))
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val t = tri(buf.d)
    val bb = ByteBuffer.allocate(4 + 4 * t * 8)
    bb.putInt(buf.d)
    var k = 0
    while (k < t) { bb.putLong(buf.n(k)); k += 1 }
    k = 0
    while (k < t) { bb.putLong(buf.qq(k)); k += 1 }
    k = 0
    while (k < t) { bb.putLong(buf.qi(k)); k += 1 }
    k = 0
    while (k < t) { bb.putLong(buf.qj(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    val t = tri(d)
    def arr(): Array[Long] = {
      val a = new Array[Long](t)
      var k = 0
      while (k < t) { a(k) = bb.getLong(); k += 1 }
      a
    }
    new GramBuffer(d, arr(), arr(), arr(), arr())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}

/** KMV (k-minimum-values / bottom-k) distinct sketch aggregate over a LONG
  * hash column: state = the k smallest DISTINCT hash values seen, emitted
  * as an ascending array. The mergeable form of the `q_x_kmv_distinct`
  * window pipeline — merge = union + re-truncate to bottom-k, so partial
  * sketches combine map-side, per-group sketches stored in a table
  * re-aggregate later without re-reading raw rows, and ONE complete-mode
  * streaming aggregate maintains the sketch exactly (set-union state is
  * order-insensitive: the drained sketch equals the batch bottom-k at any
  * micro-batch slicing). Estimate finisher: (k−1)·M div max(sketch) once
  * `size = k`, else the sketch is lossless and `size` IS the distinct
  * count. State is ≤ k longs regardless of input volume — the bound the
  * distinct-counter table tier can't give.
  *
  * Distinctness lives in the TreeSet; NULL hashes are skipped. The hash
  * domain is the caller's (the registry uses md5 pmod 2⁶² — replayable by
  * the oracle, unlike engine-private HLL/theta state).
  */
case class KmvBottomKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes {

  require(k > 0, s"kmv_bottomk: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_bottomk"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvBottomKAgg =
    copy(child = newChildren.head)
}

/** CMS point estimate over a counters vector: min over the depth rows of
  * counters[i·width + bucket_i(term)] — codegen'd via one static kernel
  * call like the rest of the native family.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(depth > 0 && width > 0,
    s"cms_estimate: depth/width must be positive, got ($depth, $width)")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(counters: Any, term: Any): Any =
    NativeKernels.cmsEstimate(counters.asInstanceOf[ArrayData],
      term.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"org.apache.spark.sql.graft.NativeKernels.cmsEstimate($c, $t, $depth, $width)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Static theta-sketch kernels (DataSketches, on the Spark classpath) —
  * invoked from generated code like [[NativeKernels]].
  */
object ThetaKernels {
  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.{SetOperation, Sketches => DsSketches}

  def wrap(bytes: Array[Byte]): org.apache.datasketches.theta.CompactSketch =
    DsSketches.wrapCompactSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Long =
    Math.round(wrap(bytes).getEstimate)

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(wrap(a))
    it.intersect(wrap(b))
    Math.round(it.getResult.getEstimate)
  }

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val op = SetOperation.builder().buildANotB()
    op.setA(wrap(a))
    op.notB(wrap(b))
    Math.round(op.getResult(true).getEstimate)
  }
}

/** Theta-sketch distinct aggregate — the SET-ALGEBRA tier of the distinct
  * family. HLL sketches (q_a4_approx_active / hllRollup) union but cannot
  * intersect; theta sketches support union, intersection AND difference,
  * answering "users who did BOTH X and Y" / "X but never Y" from stored
  * per-segment sketches without re-reading raw rows. Emits the ordered
  * compact-sketch bytes; pair with [[ThetaEstimate]] /
  * [[ThetaIntersectEstimate]] / [[ThetaAnotBEstimate]].
  *
  * Determinism: a theta union is a pure function of the input VALUE SET
  * and lgK (retained = the k lowest hashes under the min-theta rule), so
  * results are partition-layout-invariant — SketchSpec pins it. Below
  * 2^lgK distinct values the sketch is in exact mode and the estimate IS
  * the exact count; estimation mode is the 100 TB path.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ExpectsInputTypes {

  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.{SetOperation, Union}

  require(lgK >= 4 && lgK <= 26, s"theta_sketch: lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buffer.update(l.longValue())
      case s: UTF8String => buffer.update(s.getBytes)
      case other => throw new IllegalStateException(
        s"theta_sketch: unsupported input ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(true, null))
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Union of STORED compact theta sketches (binary column → one merged
  * sketch) — the re-aggregation sibling of [[ThetaSketchAgg]]: a day table
  * of sketch columns rolls up to months, and a node table of neighborhood
  * sketches propagates one hop, WITHOUT touching raw keys again. Same
  * Union buffer, so drained/streamed/batch sketches merge bit-identically;
  * NULL inputs are skipped (an empty group yields the empty sketch).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
  with ExpectsInputTypes {

  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.{SetOperation, Union}

  require(lgK >= 4 && lgK <= 26, s"theta_union: lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union"

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult(true, null))
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult(true, null).toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

/** Rounded distinct estimate of a compact theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ThetaKernels.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.ThetaKernels.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Rounded |A ∩ B| estimate of two compact theta sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ThetaKernels.intersectEstimate($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** Rounded |A \ B| estimate of two compact theta sketches. */
case class ThetaAnotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.aNotBEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ThetaKernels.aNotBEstimate($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaAnotBEstimate =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the sketch family (the aggregate siblings of
  * [[natives]]).
  */
object sketches {
  /** Per-group CMS counters (row-major depth×width array<long>). */
  def cmsSketch(term: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CmsAgg(ExpressionUtils.expression(term), depth, width).toAggregateExpression())

  /** Element-wise sum of long vectors — merges stored sketches. */
  def longVectorSum(vec: Column): Column =
    ExpressionUtils.column(
      LongVectorSumAgg(ExpressionUtils.expression(vec)).toAggregateExpression())

  /** Point estimate of `term`'s count from CMS counters. */
  def cmsEstimate(counters: Column, term: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(CmsEstimate(
      ExpressionUtils.expression(counters), ExpressionUtils.expression(term), depth, width))

  /** Per-group theta sketch (ordered compact bytes) over a long or string key. */
  def thetaSketch(key: Column, lgK: Int = 12): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(key), lgK).toAggregateExpression())

  /** Union of stored theta sketches — day→month rollup, hop propagation. */
  def thetaUnion(sketch: Column, lgK: Int = 12): Column =
    ExpressionUtils.column(
      ThetaUnionAgg(ExpressionUtils.expression(sketch), lgK).toAggregateExpression())

  /** Rounded distinct estimate of a theta sketch. */
  def thetaEstimate(sketch: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(sketch)))

  /** Rounded |A ∩ B| estimate — the set operation HLL cannot do. */
  def thetaIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaIntersectEstimate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Rounded |A \ B| estimate. */
  def thetaDiff(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaAnotBEstimate(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
