package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate as a native Catalyst aggregate function.
  *
  * `top_k(expr, k)` keeps the k largest values of `expr` (any orderable
  * type; use a struct for compound score/tie-break ordering) in a bounded
  * buffer. Because it is an aggregate function, Spark automatically runs it
  * partial+final: every map task sends AT MOST k values per group to the
  * shuffle — the scale-correct replacement for `row_number().over(window)
  * <= k` top-k, which shuffles and sorts EVERY candidate row per group.
  * (SURVEY.md §2.5 "top/top-by: bounded-heap Aggregator at scale" — this is
  * the DataFrame-lane version; [[graft.core.Fold.topBy]] is the typed one.)
  */
case class TopK(
    child: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Any]] {
  require(k > 0, "k must be positive")

  override def prettyName: String = if (largest) "graft_top_k" else "graft_bottom_k"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  @transient private lazy val ordering: Ordering[Any] = {
    val natural = TypeUtils.getInterpretedOrdering(child.dataType)
    if (largest) natural.reverse else natural
  }

  private type Buf = scala.collection.mutable.ArrayBuffer[Any]

  override def createAggregationBuffer(): Buf = new Buf(k + 16)

  /** Keep the buffer ≤ 2k between trims (amortized O(log k) per row). */
  private def trim(buf: Buf): Unit =
    if (buf.length > 2 * k) {
      val kept = buf.sorted(ordering).take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      // deep copy: unsafe rows/arrays AND generic rows with interior
      // UTF8String/array fields alias scanner-reused buffers
      buf += InternalRow.copyValue(v)
      trim(buf)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = { a ++= b; trim(a); a }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.sorted(ordering).take(k).toArray)

  // serialize the buffer as length-prefixed single-column unsafe rows
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val rowType = new StructType().add("v", child.dataType)

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { v =>
      val r = proj(InternalRow(v))
      out.writeInt(r.getSizeInBytes)
      out.write(r.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val arr = new Array[Byte](sz)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, sz)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object AggExpressions {
  /** Array of the k largest values of `e` (descending). Use a struct column
    * for compound (score, tie-break) ordering.
    */
  def topK(e: Column, k: Int): Column =
    GraftBridge.column(TopK(GraftBridge.expression(e), k).toAggregateExpression())

  /** Array of the k smallest values of `e` (ascending). For mixed-direction
    * compound orderings (score desc, id asc), negate the numeric score and
    * use bottomK — works for ANY tie-break type, numeric or not.
    */
  def bottomK(e: Column, k: Int): Column =
    GraftBridge.column(TopK(GraftBridge.expression(e), k, largest = false)
      .toAggregateExpression())
}
