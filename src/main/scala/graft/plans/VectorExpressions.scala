package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two numeric array columns, accumulating in
  * double: `acc += (double) a[i] * (double) b[i]`.
  *
  * Why a custom Catalyst expression: Spark's higher-order functions
  * (`zip_with` + `aggregate`) evaluate their lambda interpreted, per
  * element, outside whole-stage codegen — on a brute-force pair scan
  * (|pairs| x dim multiply-adds) that interpretation dominates the query.
  * This expression generates a tight primitive loop instead (measured ~20x
  * on the sf0.1 all-pairs cosine scan) while producing bit-identical
  * results to the fold it replaces (same sequential double accumulation).
  *
  * Null handling, two modes:
  *  - default (`strict = false`, the Column-API surface): a null array
  *    yields null; null *elements* contribute 0 and lengths clamp to the
  *    shorter array — the forgiving vector-math contract.
  *  - `strict = true` (used by [[RewriteVectorDot]]): exact
  *    `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` semantics — any
  *    null element or a length mismatch yields NULL (zip_with pads the
  *    shorter side with null and the fold propagates it). This makes the
  *    optimizer rewrite unconditionally sound, whatever the data.
  */
case class VectorDot(left: Expression, right: Expression,
                     strict: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = strict || super.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double|tinyint> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getter(e: Expression): String = elemType(e) match {
    case FloatType => "getFloat"
    case ByteType  => "getByte"
    case _         => "getDouble"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (strict && a.numElements() != b.numElements()) return null
    val n = math.min(a.numElements(), b.numElements())
    def read(d: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => d.getFloat(i).toDouble
      case ByteType  => d.getByte(i).toDouble
      case _         => d.getDouble(i)
    }
    val ta = elemType(left); val tb = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += read(a, ta, i) * read(b, tb, i)
      } else if (strict) {
        return null
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = getter(left)
    val getB = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      if (strict) {
        // HOF-compatible: length mismatch or any null element -> NULL
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $n = $a.numElements();
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true;
           |      break;
           |    }
           |    $acc += (double) $a.$getA($i) * (double) $b.$getB($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      } else {
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $acc += (double) $a.$getA($i) * (double) $b.$getB($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      }
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** All LSH table buckets of a vector in ONE compact codegen'd loop:
  * output[t] = sum over b of (dot(v, planes[t*bits+b]) > 0) << b, an
  * `array<long>` indexed by table.
  *
  * Why not `bits x tables` separate [[VectorDot]]-vs-literal-plane
  * expressions (the previous formulation): at tables=16/bits=6 that fused
  * 96 unrolled dot loops plus the downstream join/aggregate consume chain
  * into one whole-stage-codegen method — past the JVM JIT's huge-method
  * compile threshold, so the hottest stage ran in the bytecode interpreter
  * (~15x slower, measured 2.0s -> 0.13s on the sf0.1 probe stage). Here
  * the planes are ONE constant `double[]` reference and the work is a
  * three-level primitive loop in a method a few hundred bytecodes long.
  *
  * Per-element semantics are bit-identical to the VectorDot form: double
  * accumulation in element order, null elements contribute 0, length
  * clamps to the shorter side. */
case class VectorSignBuckets(child: Expression, planes: Seq[Seq[Double]],
                             bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def dim: Int = if (planes.isEmpty) 0 else planes.head.length
  private def tables: Int = planes.length / math.max(1, bits)

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sign_buckets expects array<float|double>, got ${dt.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](tables)
    val fl = isFloat
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var acc = 0.0
        var d = 0
        while (d < n) {
          if (!v.isNullAt(d)) {
            val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
            acc += flat(base + d) * x
          }
          d += 1
        }
        if (acc > 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $base = ($t * $bits + $b) * $dim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      if (!$v.isNullAt($d)) {
         |        $acc += $planesRef[$base + $d] * (double) $v.$get($d);
         |      }
         |    }
         |    if ($acc > 0.0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): VectorSignBuckets = copy(child = newChild)
}

/** Dense matrix-vector product against a CONSTANT row-major matrix in one
  * compact codegen'd loop: out[j] = scale * dot(planes[j], v), an
  * `array<double>` of length `planes.length` — the random-projection /
  * dimensionality-reduction kernel (JL transform with md5-derived planes).
  *
  * Same design rationale as [[VectorSignBuckets]]: the matrix is ONE
  * constant `double[]` reference (`ctx.addReferenceObj`), not `outDim`
  * separate literal-array dot expressions, so the generated method stays
  * a few hundred bytecodes and inside the JIT compile threshold. Per-dot
  * semantics match [[VectorDot]]: sequential double accumulation in
  * element order, null elements contribute 0, length clamps short. */
case class VectorProject(child: Expression, planes: Seq[Seq[Double]],
                         scale: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def dim: Int = if (planes.isEmpty) 0 else planes.head.length
  private def outDim: Int = planes.length

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_project expects array<float|double>, got ${dt.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Double](outDim)
    val fl = isFloat
    var j = 0
    while (j < outDim) {
      val base = j * dim
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) {
          val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
          acc += flat(base + d) * x
        }
        d += 1
      }
      out(j) = scale * acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", flat, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |double[] $out = new double[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  int $base = $j * $dim;
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$v.isNullAt($d)) {
         |      $acc += $planesRef[$base + $d] * (double) $v.$get($d);
         |    }
         |  }
         |  $out[$j] = $scale * $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): VectorProject = copy(child = newChild)
}

/** Codegen'd positional-equality count over two `array<long>` columns:
  * the number of positions (up to the shorter length) where both
  * elements are non-null and equal — the MinHash signature-agreement
  * kernel (`est_jaccard = eq_count / numHashes`).
  *
  * Why a custom expression: the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> IF(x=y,1,0)), 0, +)` interprets
  * its lambdas per element outside whole-stage codegen, and the
  * candidate-verify join evaluates it once per candidate pair × 64
  * lanes — the same interpretation tax [[VectorDot]] removes for
  * cosine. Semantics are identical to that HOF form: positions past the
  * shorter array contribute 0 (zip_with's null padding fails the IF),
  * as do null elements. */
case class VectorEqCount(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_eq_count expects array<bigint> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorEqCount =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization ADC (asymmetric distance computation) lookup
  * sum: `value = Σ_{i<m} lut[offsets(i) + codes[i]]` — the inner loop of
  * PQ top-k search. `codes` is a corpus row's m sub-quantizer codes
  * (array<tinyint>, dense per-subspace ids); `lut` is one QUERY's
  * flattened table of per-(subspace, code) partial dot products;
  * `offsets` is the FENCE-POST form of the per-subspace block starts —
  * m+1 entries, `offsets(i)` where subspace i's block starts and
  * `offsets(m)` the total LUT length (cumulative per-subspace codebook
  * sizes — constant after training, hence a constructor literal like
  * [[VectorSignBuckets]]'s planes). The terminal entry is load-bearing:
  * without it, a code exceeding its OWN subspace's codebook size but
  * still landing inside the flat LUT would silently read another
  * subspace's entry and return a plausible-but-wrong sum (r12 advice —
  * only the last subspace's overflow used to fall off the LUT end).
  *
  * Why a custom expression: the HOF spelling
  * (`aggregate(sequence(...), 0d, (acc,i) -> acc + element_at(...))`)
  * interprets its lambda per pair — on an all-pairs ADC scan the
  * interpretation dominates, exactly the [[VectorDot]] story. Here the
  * whole lookup is m primitive array reads inside whole-stage codegen.
  *
  * Null/range semantics: a null input array yields null; a null code or
  * lut element, a codes array shorter than m, a code outside its own
  * subspace's block `[0, offsets(i+1)-offsets(i))`, or a lookup index
  * outside `lut` also yield null (never a wrong sum — an out-of-range
  * code means the codes/codebook pairing is inconsistent and must not
  * silently score). Accumulation is sequential double in subspace order,
  * matching the oracle's sub-ordered list_sum. */
case class PqAdc(codes: Expression, lut: Expression, offsets: Seq[Int])
    extends BinaryExpression {
  require(offsets.length >= 2 && offsets.head == 0 &&
    offsets.zip(offsets.tail).forall { case (a, b) => a < b },
    s"offsets must be fence-post (m+1 strictly increasing entries " +
      s"starting at 0, terminal = LUT length), got $offsets")

  override def left: Expression = codes
  override def right: Expression = lut

  @transient private lazy val offArr: Array[Int] = offsets.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val codesOk = codes.dataType match {
      case ArrayType(ByteType | org.apache.spark.sql.types.IntegerType, _) =>
        true
      case _ => false
    }
    val lutOk = lut.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && lutOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<tinyint|int>, array<double>), got " +
          s"${codes.dataType.catalogString}, ${lut.dataType.catalogString}")
  }

  private def codesAreBytes: Boolean =
    codes.dataType.asInstanceOf[ArrayType].elementType == ByteType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val c = l.asInstanceOf[ArrayData]
    val t = r.asInstanceOf[ArrayData]
    val m = offArr.length - 1
    if (c.numElements() < m) return null
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (c.isNullAt(i)) return null
      val code = if (codesAreBytes) c.getByte(i).toInt else c.getInt(i)
      val idx = offArr(i) + code
      // idx < offArr(i+1) is the per-subspace bound: a code spilling
      // into the NEXT subspace's block is as wrong as one off the end
      if (code < 0 || idx >= offArr(i + 1) || idx >= t.numElements() ||
          t.isNullAt(idx))
        return null
      acc += t.getDouble(idx)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val offRef = ctx.addReferenceObj("offsets", offArr, "int[]")
    val getCode = if (codesAreBytes) "getByte" else "getInt"
    val m = offArr.length - 1
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      s"""
         |if ($c.numElements() < $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $code = (int) $c.$getCode($i);
         |    int $idx = $offRef[$i] + $code;
         |    if ($code < 0 || $idx >= $offRef[$i + 1] ||
         |        $idx >= $t.numElements() || $t.isNullAt($idx)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $t.getDouble($idx);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(codes = newLeft, lut = newRight)
}

object VectorExpressions {
  /** Column-level dot product backed by [[VectorDot]]. */
  def vectorDot(a: Column, b: Column): Column =
    SqlBridge.column(VectorDot(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Column-level signature-agreement count backed by [[VectorEqCount]]. */
  def vectorEqCount(a: Column, b: Column): Column =
    SqlBridge.column(VectorEqCount(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Column of all LSH table buckets (array<long>, one per table) backed
    * by [[VectorSignBuckets]]. `planes` is row-major (table x bit). */
  def vectorSignBuckets(v: Column, planes: Seq[Seq[Double]],
                        bits: Int): Column =
    SqlBridge.column(VectorSignBuckets(SqlBridge.expression(v), planes, bits))

  /** Column of the scaled constant-matrix projection (array<double>)
    * backed by [[VectorProject]]. `planes` is row-major (out-dim rows). */
  def vectorProject(v: Column, planes: Seq[Seq[Double]],
                    scale: Double): Column =
    SqlBridge.column(VectorProject(SqlBridge.expression(v), planes, scale))

  /** Column-level PQ lookup sum backed by [[PqAdc]]: codes indexes a
    * query's flattened LUT at constant per-subspace `offsets` —
    * FENCE-POST form, m+1 entries with the total LUT length last (the
    * terminal entry bounds the last subspace; interior entries bound
    * each code to its own block). */
  def pqAdc(codes: Column, lut: Column, offsets: Seq[Int]): Column =
    SqlBridge.column(PqAdc(
      SqlBridge.expression(codes), SqlBridge.expression(lut), offsets))

  /** Register `vector_dot(a, b)` / `vector_eq_count(a, b)` for SQL
    * callers on this session (temp-function registry — the SQL analogue
    * of the Column API above). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_eq_count", exprs => VectorEqCount(exprs(0), exprs(1)),
      "built-in")
  }
}
