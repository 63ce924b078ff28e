package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/**
 * Native grid-region-mean fingerprint kernel — the whole
 * [[graft.operators.Multimodal]] `gridMeans` reduction (exact scaled
 * per-(grid row, grid col, channel) region means over a row-major
 * w×h×c pixel region inside a binary payload) as ONE expression
 * evaluation: `grid_means(bin, pixStart, w, h, c)` with plan-time
 * `grid`/`meanScale` → `array<long>` of g²·c elements, element
 * (gy, gx, k) = floorDiv(regionByteSum · meanScale, regionPixels).
 *
 * Why a custom Expression (SURVEY §7.5 preference order): the built-in
 * formulation is `transform(sequence(...), idx -> aggregate(sequence(...),
 * ...))` — nested CodegenFallback HigherOrderFunctions that evaluate
 * ~200 interpreted expression nodes (ediv/pmod chains + a byte read) per
 * FRAME, the measured wall of the sf10 phash/cross media rows (~350M node
 * evals per run). This kernel is one tight JVM loop per payload: ~g²·c
 * region loops of (bounds check + mask + add), zero allocation beyond the
 * output array.
 *
 * Bit-identical to the HOF form on the callers' guarded domain
 * (w, h > 0, c > 0, grid | w, grid | h — the frameOk/imgOk rejects),
 * INCLUDING the null lanes, spec-pinned in MultimodalCodecSpec:
 *  - any byte read past the payload end → that element NULL (the byte_at
 *    convention; the HOF aggregate's `acc + null` poisons the region sum
 *    the same way);
 *  - any NULL input → NULL result (sequence-over-null semantics).
 * Outside that domain the kernel is strictly MORE defined than the HOF
 * form: a zero-pixel region (w or h < grid) yields element NULL where the
 * HOF's ediv(·, 0) throws REMAINDER_BY_ZERO under ANSI (callers guard it
 * away via the grid-divisibility rejects), and non-positive c yields NULL.
 * Division semantics replicate `ediv` exactly: `(num − pmod(num, den)) /
 * den` on nonneg operands is Math.floorDiv.
 *
 * CodegenFallback is deliberate: the video-side call sites sit INSIDE
 * `transform` lambdas (per-frame), where Spark evaluates interpreted
 * regardless — the win is the tight eval, not generated code. The eval is
 * a single virtual call per payload/frame against the HOF chain's
 * hundreds.
 */
case class GridMeans(bin: Expression, pixStart: Expression, fw: Expression,
    fh: Expression, fc: Expression, grid: Int, meanScale: Long)
  extends Expression with CodegenFallback {

  require(grid >= 1, "need a positive grid")
  require(meanScale >= 1, "need a positive mean scale")

  override def children: Seq[Expression] = Seq(bin, pixStart, fw, fh, fc)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "grid_means"

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(BinaryType, LongType, LongType, LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(
        s"grid_means requires (binary, bigint×4), got $ts")
    }

  override def eval(input: InternalRow): Any = {
    val b = bin.eval(input)
    val st = pixStart.eval(input)
    val w = fw.eval(input)
    val h = fh.eval(input)
    val c = fc.eval(input)
    if (b == null || st == null || w == null || h == null || c == null)
      return null
    val bytes = b.asInstanceOf[Array[Byte]]
    val start = st.asInstanceOf[Long]
    val wl = w.asInstanceOf[Long]
    val hl = h.asInstanceOf[Long]
    val cl = c.asInstanceOf[Long]
    // outside the callers' guarded domain (decode rejects keep these
    // positive) — surface as null rather than a partial array
    if (cl <= 0L || wl < 0L || hl < 0L) return null
    val rh = hl / grid
    val rw = wl / grid
    val region = rh * rw
    val gf = grid.toLong * cl
    val n = (grid.toLong * grid * cl).toInt
    val out = new Array[Any](n)
    var idx = 0L
    while (idx < n) {
      if (region <= 0L) out(idx.toInt) = null
      else {
        val gy = idx / gf
        val rem = idx % gf
        val gx = rem / cl
        val k = rem % cl
        var sum = 0L
        var p = 0L
        var ok = true
        while (ok && p < region) {
          val r = p / rw
          val s = p % rw
          val pos = start + ((gy * rh + r) * wl + gx * rw + s) * cl + k
          if (pos < 1L || pos > bytes.length) ok = false
          else { sum += (bytes((pos - 1L).toInt) & 0xff).toLong; p += 1L }
        }
        out(idx.toInt) = if (!ok) null else Math.floorDiv(sum * meanScale, region)
      }
      idx += 1L
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GridMeans =
    copy(bin = newChildren(0), pixStart = newChildren(1), fw = newChildren(2),
      fh = newChildren(3), fc = newChildren(4))
}
