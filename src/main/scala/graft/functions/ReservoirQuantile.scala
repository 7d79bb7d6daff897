package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable aggregation state of [[ReservoirQuantile]]: the ≤ k sample rows
  * with the SMALLEST (hashKey, value) pairs seen so far, kept in a
  * max-heap so eviction is O(log k). */
final class ReservoirState(val k: Int) {
  // max-heap on (hash, value): the root is the first entry to evict
  val heap: scala.collection.mutable.PriorityQueue[(String, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(String, Long)](
      Ordering.Tuple2[String, Long])

  def insert(h: String, v: Long): Unit = {
    if (heap.size < k) heap.enqueue((h, v))
    else if (Ordering.Tuple2[String, Long].lt((h, v), heap.head)) {
      heap.dequeue(); heap.enqueue((h, v))
    }
  }
}

/** `graft_reservoir_quantile(hash, value, k, p)` — a DETERMINISTIC
  * mergeable quantile sketch as a custom Catalyst
  * [[TypedImperativeAggregate]] (the custom-AGGREGATE extension seam; the
  * scalar kernels in [[GraftFunctions]] exercise the expression seam).
  *
  * The sketch keeps the k rows with the smallest content-hash keys — a
  * uniform sample of the group that is a pure FUNCTION OF THE DATA, not
  * of partitioning or arrival order: "k smallest by (hash, value)" is
  * associative and commutative over the DISJOINT partials Spark's
  * aggregation actually produces (top-k of a disjoint union = top-k of
  * per-side top-ks — the same algebra `stream_sample` folds through
  * versioned state), so partial aggregation, shuffles, retries and ANY
  * batching of the input rows produce the identical MULTISET sample —
  * duplicate input rows are duplicate sample entries by design, exactly
  * as a single-partition run would keep them — and therefore the
  * identical quantile estimate, which is why the estimate can be
  * hash-checked against an independent engine instead of carrying a
  * tolerance. The merge is NOT idempotent: merging two states that
  * contain the SAME row's entry counts it twice (the heap is a
  * multiset). No Spark execution path ever merges overlapping states —
  * each input row lands in exactly one partial — so idempotence is
  * neither provided nor required; callers hand-merging states they
  * built themselves must keep the inputs disjoint (spec-pinned in
  * ReservoirMergeSpec). eval() interpolates the p-quantile over the
  * sample's sorted values exactly like SQL `percentile_cont`.
  *
  * State is k-bounded forever (k·~40 bytes); a 100 TB group costs the
  * same state as a 100-row group. One pass, map-side partials, no sort
  * of the group — vs `percentile`'s per-group collect-and-sort. */
case class ReservoirQuantile(
    hashChild: Expression, valueChild: Expression, k: Int, p: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirState] {

  require(k > 0, s"graft_reservoir_quantile: k must be positive, got $k")
  require(p >= 0.0 && p <= 1.0,
    s"graft_reservoir_quantile: p must be in [0, 1], got $p")

  // analysis-time contract: hash is STRING, value is BIGINT — a SQL caller
  // passing e.g. an INT or DOUBLE value gets an analysis error naming the
  // argument, never an executor-side ClassCastException from the raw
  // eval() casts below. (ExpectsInputTypes is off-limits: AbstractDataType
  // is private[sql] in Spark 4 — so the contract is enforced here, and a
  // mistyped value column must be cast explicitly by the caller.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_reservoir_quantile: argument 'hash' must be STRING, got " +
          hashChild.dataType.sql)
    else if (valueChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_reservoir_quantile: argument 'value' must be BIGINT, got " +
          valueChild.dataType.sql)
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(hashChild, valueChild)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ReservoirState = new ReservoirState(k)

  override def update(buf: ReservoirState, input: InternalRow): ReservoirState = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      buf.insert(h.asInstanceOf[UTF8String].toString, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ReservoirState, other: ReservoirState): ReservoirState = {
    other.heap.foreach { case (h, v) => buf.insert(h, v) }
    buf
  }

  override def eval(buf: ReservoirState): Any = {
    if (buf.heap.isEmpty) null
    else {
      val vs = buf.heap.toArray.map(_._2).sorted
      val pos = p * (vs.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      vs(lo).toDouble + (pos - lo) * (vs(hi).toDouble - vs(lo).toDouble)
    }
  }

  override def serialize(buf: ReservoirState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (h, v) =>
      val hb = h.getBytes("UTF-8")
      out.writeInt(hb.length); out.write(hb); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ReservoirState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new ReservoirState(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val hb = new Array[Byte](len); in.readFully(hb)
      st.insert(new String(hb, "UTF-8"), in.readLong())
    }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirQuantile =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
  override def prettyName: String = "graft_reservoir_quantile"
}
