package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (score, id) pairs under
  * (score DESC, id ASC), kept in a 2k scratch that compacts by sort —
  * amortized O(log k) per insert, ≤ 2k entries ever held. */
private[functions] final class TopKState(val k: Int) {
  private val cap = 2 * k
  val scores = new Array[Double](cap)
  val ids = new Array[Long](cap)
  var n = 0

  def add(s: Double, id: Long): Unit = {
    if (n == cap) compact()
    scores(n) = s; ids(n) = id; n += 1
  }

  /** Sort by (score desc, id asc), truncate to k. */
  def compact(): Unit = {
    val idx = Array.range(0, n).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    val keep = math.min(k, n)
    val ss = new Array[Double](keep); val is = new Array[Long](keep)
    var i = 0
    while (i < keep) { ss(i) = scores(idx(i)); is(i) = ids(idx(i)); i += 1 }
    System.arraycopy(ss, 0, scores, 0, keep)
    System.arraycopy(is, 0, ids, 0, keep)
    n = keep
  }
}

/** `topk_by(score, id, k)` → array<struct<score double, id bigint>>:
  * the k best ids by (score DESC, id ASC), as a partial-merge aggregate.
  *
  * The scale story: a rank-window top-k (`row_number over (partition by
  * group order by score desc)`) shuffles and sorts EVERY scored row; this
  * aggregate cuts map-side — at most k pairs per group per partition cross
  * the shuffle, and merge is k-bounded. For |Q| queries over an N-row
  * corpus that turns the |Q|·N shuffle of the exact similarity search into
  * |Q|·k·partitions. Runs under ObjectHashAggregateExec with partial
  * aggregation (the TypedImperativeAggregate contract).
  *
  * NULL and NaN scores are skipped (NaN compares greater than every
  * double in Spark's ordering — a zero-norm junk vector must not outrank
  * real neighbors; callers previously had to remember an `!isnan` guard). */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "topk_by: k must be positive")

  override def prettyName: String = "topk_by"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.expect(prettyName,
      score.dataType.isInstanceOf[DoubleType] && id.dataType.isInstanceOf[LongType],
      "(double, bigint)", Seq(score.dataType, id.dataType))

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(sv)) buf.add(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.n) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKState): Any = {
    buf.compact()
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    buf.compact()
    val bb = ByteBuffer.allocate(8 + 16 * buf.n)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKState(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
