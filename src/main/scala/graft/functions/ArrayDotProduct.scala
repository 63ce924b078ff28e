package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native codegen'd dot product over two `array<double>` columns.
 *
 * Why a custom Expression (SURVEY §7.5 preference order: built-ins → custom
 * Expression → custom plan): the built-in formulation
 * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates an intermediate array
 * per row and evaluates two lambda closures per element through
 * HigherOrderFunction interpretation. This expression is one fused loop in
 * generated Java — no allocation, no virtual calls — and keeps the exact
 * left-to-right summation order of the built-in chain (and of DuckDB's
 * list_dot_product), so results stay bit-identical for oracle verification.
 *
 * Inner-loop cost matters here: similarity search evaluates it
 * |queries|×|corpus| times.
 */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Native codegen'd integer dot product over two `array<int>` columns,
 * summing into a LONG — [[ArrayDotProduct]]'s exact-arithmetic sibling for
 * quantized-level vectors (SQ8/PQ codes). The built-in
 * `aggregate(zip_with(...))` chain is a HigherOrderFunction — CodegenFallback,
 * two interpreted closures and an allocated intermediate array per row —
 * which is the difference between a memory-bound and a compute-bound scan
 * when the expression runs |queries|×|corpus| times. Per-element products
 * fit int (the caller's levels are within ±127 — but the long accumulator
 * is widened BEFORE the multiply anyway, so even full-range int inputs
 * cannot overflow); the sum is an exact long in both the interpreted and
 * generated paths.
 */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_long requires (array<int>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "array_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getInt(i).toLong * y.getInt(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.graft.bridge

  /** Column-level API (classic-backend column from a catalyst expression). */
  def array_dot(a: Column, b: Column): Column =
    bridge.column(ArrayDotProduct(bridge.expression(a), bridge.expression(b)))

  /** Exact integer dot of two array<int> columns as a long — codegen'd. */
  def array_dot_long(a: Column, b: Column): Column =
    bridge.column(ArrayDotLong(bridge.expression(a), bridge.expression(b)))

  /** Unsigned byte of a binary column at a 1-based long position, as a
    * long in [0, 255]; null out of range — the codegen'd kernel under the
    * media decode paths (replaces conv(hex(substring(...))) per pixel). */
  def byte_at(bin: Column, pos: Column): Column =
    bridge.column(ByteAt(bridge.expression(bin),
      bridge.expression(pos.cast("long"))))

  /** Exact scaled grid-region means over a w×h×c pixel region inside a
    * binary payload, as array<long> — the single-eval kernel under the
    * media fingerprint paths (replaces the nested transform/aggregate
    * HOF chain; see [[GridMeans]]). */
  def grid_means(bin: Column, pixStart: Column, fw: Column, fh: Column,
      fc: Column, grid: Int, meanScale: Long): Column =
    bridge.column(GridMeans(bridge.expression(bin),
      bridge.expression(pixStart.cast("long")),
      bridge.expression(fw.cast("long")), bridge.expression(fh.cast("long")),
      bridge.expression(fc.cast("long")), grid, meanScale))

  /** Distinct winnowing fingerprints (md5-derived 60-bit k-gram hashes →
    * sliding w-window minima) of a pre-normalized string, as array<long> —
    * the codegen'd single-pass kernel behind
    * [[graft.operators.TextOps.winnowFingerprints]]. */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    bridge.column(WinnowFingerprints(bridge.expression(text), k, w))

  /** Aggregate: the k largest values of `sortKey` (struct for multi-key
    * ordering) as a descending array — O(keys·k) through the shuffle instead
    * of a per-key sort. */
  def topk_by(sortKey: Column, k: Int): Column =
    bridge.column(BoundedTopK(bridge.expression(sortKey), k).toAggregateExpression())

  /** Aggregate: Misra-Gries frequent-items candidates — every key with
    * frequency > n/(capacity+1) is guaranteed present; O(capacity) state per
    * buffer through the shuffle regardless of key cardinality. Recount the
    * candidates exactly for an order-independent final answer. */
  def mg_candidates(key: Column, capacity: Int): Column =
    bridge.column(MisraGries(bridge.expression(key), capacity).toAggregateExpression())

  /** Aggregate: k-minimum-values distinct sketch over LONG hash inputs —
    * the k smallest DISTINCT hashes as an ascending array. O(k) state per
    * buffer; mergeable and comparable (unlike HLL registers), which is what
    * the KMV distinct / overlap estimators in
    * [[graft.operators.Sketches]] build on. */
  def kmin_values(hash: Column, k: Int): Column =
    bridge.column(KMinValues(bridge.expression(hash), k).toAggregateExpression())

  /** Aggregate: bloom membership sketch over LONG inputs (hash strings with
    * `xxhash64` first) — Spark's own runtime-join-filter aggregate
    * ([[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]),
    * lifted to the Column API (the SQL names `bloom_agg`/`bloom_might_contain`
    * are also registered by [[graft.plans.GraftExtensions]]). ~1 byte/item at
    * the default ~3 % false-positive rate; no false negatives ever. */
  def bloom_agg(c: Column, expectedItems: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    bridge.column(new BloomFilterAggregate(bridge.expression(c),
      Literal(expectedItems)).toAggregateExpression())
  }

  /** Membership probe against a [[bloom_agg]] sketch. Spark requires the
    * sketch side to be a CONSTANT or scalar subquery (pass
    * `sketchDf.scalar()` or a collected `lit(bytes)`) — that is what lets
    * the probe compile to a map-side filter with no join in the plan. */
  def bloom_might_contain(sketch: Column, value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    bridge.column(BloomFilterMightContain(
      bridge.expression(sketch), bridge.expression(value)))
  }
}
