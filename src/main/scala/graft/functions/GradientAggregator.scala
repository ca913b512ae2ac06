package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (bucket, tf) feature entry of a doc's bucket-sorted array. */
case class BucketTf(bucket: Long, tf: Long)

/** One doc flowing into the classifier gradient pass: teacher label +
  * the bucket-ASC-sorted hashed feature array. */
case class DocFeat(y: Long, fa: Array[BucketTf])

/** One full-batch GD gradient pass (r19, the classifier loop's hot
  * kernel): per doc, the margin is the SAME bucket-ascending IEEE fold
  * the declarative HOF expression ran (m += w(bucket)·tf.toDouble in
  * array order), pq = ⌊softsign(m)·10⁶⌋ with the identical op sequence
  * (or the constant 500000 seed on iteration 1, w ≡ 0), and the exact
  * integer coefficient c = pq − 10⁶·y accumulates c·tf into a
  * dim-length Long buffer. Buffers merge by element-wise exact
  * addition — order-free — so the finished array equals the
  * `explode + groupBy(bucket).sum` gradient bit-for-bit while shipping
  * one dim-length array per partition instead of exploded feature rows
  * through a hash aggregate (guide §2.3, aggregate before you
  * shuffle; §4, compiled kernel over interpreted HOFs). */
class GradientAggregator(dim: Int, w: Array[Double], seed: Boolean)
    extends Aggregator[DocFeat, Array[Long], Array[Long]] {
  require(dim > 0 && w.length == dim)

  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(buf: Array[Long], in: DocFeat): Array[Long] = {
    var pq = 500000L
    if (!seed) {
      var m = 0.0
      var i = 0
      while (i < in.fa.length) {
        val e = in.fa(i)
        m += w(e.bucket.toInt) * e.tf.toDouble
        i += 1
      }
      val p = 0.5 * (1.0 + (m / (1.0 + math.abs(m))))
      pq = math.floor(p * 1000000.0).toLong
    }
    val c = pq - 1000000L * in.y
    var i = 0
    while (i < in.fa.length) {
      val e = in.fa(i)
      buf(e.bucket.toInt) += c * e.tf
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
