package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (id, score) candidate flowing into the top-k aggregate. */
case class Scored(id: Long, score: Double)

/** Bounded top-k aggregate (SURVEY.md §2.5/§7.4): keeps the k best
  * (score DESC, id ASC — matching ORDER BY sim DESC, vec_id) candidates
  * per group, merging partial heaps.
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy(qid))`
  * sorts EVERY candidate row inside each partition (a full shuffle +
  * sort of N·Q scored pairs). An Aggregator runs as a two-phase
  * ObjectHashAggregate: each task reduces its slice to ≤ k rows
  * (map-side partial), and only Q·k·#partitions tiny buffers cross the
  * wire — the correct distributed top-k at 100 TB.
  *
  * The buffer is a plain sorted Array (descending score): k is small
  * (10–100), so bounded insertion beats heap constant factors and
  * keeps the buffer trivially encodable.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], in: Scored): Array[Scored] =
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      // insert in descending order, drop overflow
      val pos = buf.indexWhere(better(in, _)) match {
        case -1 => buf.length
        case p  => p
      }
      val out = new Array[Scored](math.min(buf.length + 1, k))
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = in
      System.arraycopy(buf, pos, out, pos + 1, out.length - pos - 1)
      out
    }

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] = {
    // merge two sorted runs, keep first k
    val out = new Array[Scored](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && better(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Scored]): Array[Scored] = buf

  override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder[Array[Scored]]()
  override def outputEncoder: Encoder[Array[Scored]] = ExpressionEncoder[Array[Scored]]()
}

/** One (id, aux, score) candidate — [[Scored]] plus a Long payload the
  * caller carries through the cut (a co-occurrence count, a shared-item
  * count). Ordering contract identical: score DESC, id ASC. */
case class ScoredAux(id: Long, aux: Long, score: Double)

/** [[TopKAggregator]] with one Long payload column riding along — the
  * r19 replacement for the `row_number().over(partitionBy(g).orderBy(
  * score DESC, id))` + `filter(rk <= k)` windows in the recsys serving
  * plans (q121/q130/q224): the window shape full-sorts every candidate
  * row per partition (25 M pair rows at sf0.1), while this aggregate
  * reduces map-side to ≤ k rows per group before the exchange — only
  * groups·k rows per task cross the wire (guide §2.3, aggregate before
  * you shuffle). Emitting `posexplode` over the sorted result yields
  * the identical (row, rank) set row_number produced: the ordering key
  * is the same, ranks 1..k are the k first rows of that total order,
  * and id uniqueness per group makes the order tie-free. */
class TopKAuxAggregator(k: Int)
    extends Aggregator[ScoredAux, Array[ScoredAux], Array[ScoredAux]] {
  require(k > 0)

  private def better(a: ScoredAux, b: ScoredAux): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[ScoredAux] = Array.empty

  override def reduce(buf: Array[ScoredAux], in: ScoredAux): Array[ScoredAux] =
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      val pos = buf.indexWhere(better(in, _)) match {
        case -1 => buf.length
        case p  => p
      }
      val out = new Array[ScoredAux](math.min(buf.length + 1, k))
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = in
      System.arraycopy(buf, pos, out, pos + 1, out.length - pos - 1)
      out
    }

  override def merge(a: Array[ScoredAux], b: Array[ScoredAux]): Array[ScoredAux] = {
    val out = new Array[ScoredAux](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && better(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[ScoredAux]): Array[ScoredAux] = buf

  override def bufferEncoder: Encoder[Array[ScoredAux]] = ExpressionEncoder[Array[ScoredAux]]()
  override def outputEncoder: Encoder[Array[ScoredAux]] = ExpressionEncoder[Array[ScoredAux]]()
}
