package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the charsequence surface that Spark's
  * built-ins cannot express (SURVEY.md §2.6):
  *
  *   - [[CodePointsExpr]] — string → array<int> of Unicode code points
  *     (the reference's `Charsequence.getPoints`, charsequence.h:1264-1281)
  *     with real `doGenCode`, so it stays inside whole-stage codegen
  *     (unlike a `transform(sequence…)` lambda, which is interpreted);
  *   - [[Utf32Encode]] / [[Utf32Decode]] — the utf32le/be charsets
  *     (charsequence.h:21-32, 214-263, 428-495) missing from Spark's
  *     encode/decode; strict validation with U+FFFD replacement exactly
  *     like the reference (invalid scalar → U+FFFD on encode; bad length /
  *     out-of-range / surrogate word → U+FFFD on decode).
  */
case class CodePointsExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_code_points"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(input.asInstanceOf[UTF8String].toString.codePoints().toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int[] ${ev.value}_cps = $c.toString().codePoints().toArray();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_cps);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CodePointsExpr =
    copy(child = newChild)
}

/** Dot product of two array<double|float> columns with real `doGenCode` —
  * the hot loop of every similarity/ANN operator. `zip_with` + `aggregate`
  * express the same thing but higher-order-function lambdas run
  * INTERPRETED (one closure call + boxing per element); this native loop
  * reads packed ArrayData inside whole-stage codegen. Float elements are
  * widened per element (float→double is exact), so callers can dot raw
  * float embeddings against double literals WITHOUT the array-copying
  * `cast(array<double>)` projection. Accumulation is ascending-index
  * double either way — bit-identical to the cast-then-fold form. Lengths
  * may differ (shorter wins) — callers pass equal-dim vectors. */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Only array<float>/array<double> inputs make sense — anything else
    * would read garbage through getDouble. Checked at ANALYSIS time, not
    * discovered inside codegen. NULL ELEMENTS count as 0.0 (additive
    * identity — a null dimension contributes nothing), checked only when
    * the array type admits nulls so nullless columns keep the tight
    * loop. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  private def mayHaveNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val xf = isFloat(left); val yf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv =
        if (x.isNullAt(i)) 0.0
        else if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv =
        if (y.isNullAt(i)) 0.0
        else if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      def get(arr: String, idx: String, e: Expression) = {
        val raw =
          if (isFloat(e)) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
        if (mayHaveNulls(e)) s"($arr.isNullAt($idx) ? 0.0 : $raw)" else raw
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, i, left)} * ${get(b, i, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class Utf32Encode(child: Expression, bigEndian: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = if (bigEndian) "graft_utf32be_encode" else "graft_utf32le_encode"

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val out = new Array[Byte](cps.length * 4)
    var i = 0
    while (i < cps.length) {
      // lone surrogates cannot appear in a valid String's codePoints();
      // out-of-range values are impossible — but keep the reference's
      // U+FFFD guard for defense in depth (charsequence.h:214-231)
      val cp = if (cps(i) > 0x10FFFF || (cps(i) >= 0xD800 && cps(i) <= 0xDFFF)) 0xFFFD else cps(i)
      val o = i * 4
      if (bigEndian) {
        out(o) = ((cp >> 24) & 0xff).toByte; out(o + 1) = ((cp >> 16) & 0xff).toByte
        out(o + 2) = ((cp >> 8) & 0xff).toByte; out(o + 3) = (cp & 0xff).toByte
      } else {
        out(o) = (cp & 0xff).toByte; out(o + 1) = ((cp >> 8) & 0xff).toByte
        out(o + 2) = ((cp >> 16) & 0xff).toByte; out(o + 3) = ((cp >> 24) & 0xff).toByte
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Utf32Encode =
    copy(child = newChild)
}

case class Utf32Decode(child: Expression, bigEndian: Boolean)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = if (bigEndian) "graft_utf32be_decode" else "graft_utf32le_decode"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val sb = new java.lang.StringBuilder(bytes.length / 4 + 1)
    var o = 0
    while (o + 4 <= bytes.length) {
      val cp =
        if (bigEndian)
          ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
            ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        else
          (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      // strict validation → U+FFFD (charsequence.h:428-471)
      val valid = cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)
      sb.appendCodePoint(if (valid) cp else 0xFFFD)
      o += 4
    }
    if (o < bytes.length) sb.appendCodePoint(0xFFFD) // truncated trailing unit
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Utf32Decode =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the canonicalization step a dedup pipeline needs before
  * hashing text (visually identical strings with different code-point
  * sequences — combining marks vs precomposed, compatibility forms —
  * must digest identically or exact dedup silently under-merges). Spark
  * has no built-in for this; a Scala UDF would run interpreted with
  * per-row boxing. `java.text.Normalizer` is pure-JVM ICU-equivalent
  * for the four standard forms. */
case class UnicodeNormalize(child: Expression, form: java.text.Normalizer.Form)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.name().toLowerCase}"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.${form.name()}));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Session registration for the native expressions, so they are usable
  * from SQL and via `call_function`. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    java.text.Normalizer.Form.values().foreach { form =>
      reg.createOrReplaceTempFunction(s"graft_${form.name().toLowerCase}",
        exprs => UnicodeNormalize(exprs.head, form), "built-in")
    }
    reg.createOrReplaceTempFunction("graft_code_points",
      exprs => CodePointsExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_utf32le_encode",
      exprs => Utf32Encode(exprs.head, bigEndian = false), "built-in")
    reg.createOrReplaceTempFunction("graft_utf32be_encode",
      exprs => Utf32Encode(exprs.head, bigEndian = true), "built-in")
    reg.createOrReplaceTempFunction("graft_utf32le_decode",
      exprs => Utf32Decode(exprs.head, bigEndian = false), "built-in")
    reg.createOrReplaceTempFunction("graft_utf32be_decode",
      exprs => Utf32Decode(exprs.head, bigEndian = true), "built-in")
  }
}
