package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass winnowing kernel (Schleimer/Wilkerson/Aiken selection over
 * md5-derived char-k-gram hashes): for a normalized document, hash every
 * char k-gram, slide a w-window over the hash sequence, and return the
 * DISTINCT window minima (first-appearance order) as `array<long>`.
 *
 * Why a custom Expression (SURVEY §7.5 preference order): the built-in
 * formulation is a nested higher-order-function chain —
 * `array_distinct(transform(seq, i -> array_min(slice(hashes, i, w))))` over
 * `transform(sequence(...), p -> conv(substring(md5(substr(norm,p,k)),1,15),16,10))`
 * — which is CodegenFallback end-to-end and, per position, allocates a
 * substring, casts it to binary, hex-encodes the md5, re-parses 15 hex chars
 * with `conv`, and later allocates a w-element slice for each window. This
 * kernel walks the document's UTF-8 bytes ONCE (code-point offsets computed
 * in place, so char-indexed k-grams match `substr` semantics for non-ASCII
 * text), feeds byte ranges straight into one reused MessageDigest, folds the
 * first 15 hex chars arithmetically from the raw digest bytes, and keeps the
 * sliding minimum with a monotonic deque — O(n) total, zero per-position
 * allocation beyond the digest's 16-byte output.
 *
 * The hash is BIT-IDENTICAL to [[graft.operators.TextOps.portableHash]]
 * (`conv(substring(md5(s),1,15),16,10)`): first 60 bits of md5 over the
 * k-gram's UTF-8 bytes. DuckDB computes the same value via
 * `('0x' || substr(md5(s),1,15))::bigint`, so the oracle for
 * `text_winnow_fingerprints` is unchanged. Parity with the HOF reference
 * form is spec-pinned in `TextDedupSpec` (ASCII + multi-byte + edge lengths).
 */
object WinnowKernel {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of the digest as an unsigned 60-bit long — the
    * arithmetic form of `conv(substring(hex(md5),1,15),16,10)`. */
  private def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Distinct w-window minima over the k-gram hash sequence of `norm`.
    * Returns an empty array when the doc has fewer than k+w-1 chars (no
    * complete window) — callers usually pre-filter those rows so the scan
    * prunes them, but the kernel is total either way. */
  def fingerprints(norm: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = norm.getBytes
    val nBytes = bytes.length
    // Code-point start offsets (substr counts chars, not bytes).
    val offs = new Array[Int](nBytes + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      offs(nChars) = b
      val first = bytes(b) & 0xff
      b += (if (first < 0x80) 1
            else if (first < 0xe0) 2
            else if (first < 0xf0) 3
            else 4)
      nChars += 1
    }
    offs(nChars) = nBytes
    val nPos = nChars - (k - 1) // k-gram count
    val nWin = nPos - (w - 1)   // complete-window count
    if (nWin <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

    val md = digests.get()
    val h = new Array[Long](nPos)
    var p = 0
    while (p < nPos) {
      md.reset()
      md.update(bytes, offs(p), offs(p + k) - offs(p))
      h(p) = hash60(md.digest())
      p += 1
    }

    // Monotonic deque of indices: front is the current window minimum.
    val dq = new Array[Int](nPos)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < nPos) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = h(dq(head))
        if (seen.add(m)) out += m
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.result())
  }
}

/**
 * `winnow_fingerprints(text, k, w)`: distinct winnowing fingerprints of a
 * pre-normalized string as `array<long>` — the codegen'd single-pass form of
 * the HOF chain in [[graft.operators.TextOps.winnowFingerprintsHof]]. The
 * generated code is one static-object call per row, so the projection stays
 * inside whole-stage codegen (the HOF form is CodegenFallback).
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_fingerprints requires k,w >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(s: Any): Any =
    WinnowKernel.fingerprints(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowKernel$$.MODULE$$.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
