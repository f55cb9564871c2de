package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

/** PQ code assignment against a LITERAL codebook as ONE native
  * expression — code_j = argmin_t of (−2·x_sub·c_{j,t} + |c_{j,t}|²),
  * ties to the smaller centroid id. Replaces the m·ksub-node
  * `least(struct(dot(slice…)))` forest the r19 profiling caught running
  * ~95 µs/row: outside whole-stage codegen (e.g. feeding an
  * ObjectHashAggregate ranker) that forest's one-shot projection
  * compiles to a method too large to JIT and executes as cold bytecode,
  * while this tight reference-array loop stays small in any stage —
  * and shrinks the plan from hundreds of literal nodes to one.
  *
  * Bit-compatibility with the expression form it replaces
  * ([[graft.operators.Similarity.pqCodesExpr]]'s r18 shape): ascending-
  * index double accumulation per subvector (float elements widened
  * per element — exact), d = −2·s + |c|² with the squared norm
  * PRECOMPUTED driver-side from the same doubles, null elements read
  * as 0.0 (the [[DotProductExpr]] convention), short vectors truncate
  * each subvector like `slice` (missing dims contribute nothing), and
  * the argmin keeps the earlier centroid on `Double.compare` ties —
  * exactly `least`'s (d asc, cid asc) struct order (d is never −0.0:
  * it always ends in `+ |c|²`, and −0.0 + (+0.0) = +0.0).
  * `books(sub)(centroid)(localDim)`. The codebook is constructor data
  * and MUST NOT be mutated after construction (sqNorms derives lazily
  * from the same reference); case-class equality on it is reference-
  * based — conservative (missed subexpression elimination / plan-cache
  * reuse), never incorrect. */
case class PqCodesExpr(child: Expression, books: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"

  @transient private lazy val m = books.length
  @transient private lazy val ksub = books(0).length
  @transient private lazy val dsub = books(0)(0).length
  @transient private lazy val sqNorms: Array[Array[Double]] =
    books.map(_.map(cv => { var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }; s }))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType | DoubleType, _)
        if books.nonEmpty && books.forall(b => b.nonEmpty &&
          b.forall(_.length == books(0)(0).length)) &&
          books.forall(_.length == books(0).length) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float>/array<double> argument and a " +
            s"rectangular non-empty codebook, got ${child.dataType.catalogString}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  private def mayHaveNulls: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = vec.numElements()
    val fl = isFloat
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var bestD = 0.0; var bestC = 0L; var first = true
      var t = 0
      while (t < ksub) {
        val cv = books(j)(t)
        var s = 0.0; var i = 0
        val lim = math.max(0, math.min(dsub, n - base))
        while (i < lim) {
          val x =
            if (mayHaveNulls && vec.isNullAt(base + i)) 0.0
            else if (fl) vec.getFloat(base + i).toDouble
            else vec.getDouble(base + i)
          s += x * cv(i); i += 1
        }
        val d = -2.0 * s + sqNorms(j)(t)
        if (first || java.lang.Double.compare(d, bestD) < 0) {
          bestD = d; bestC = t.toLong; first = false
        }
        t += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val normsRef = ctx.addReferenceObj("pqNorms", sqNorms, "double[][]")
    nullSafeCodeGen(ctx, ev, vec => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val d = ctx.freshName("d"); val lim = ctx.freshName("lim")
      val base = ctx.freshName("base"); val cv = ctx.freshName("cv")
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val get =
        if (isFloat) s"(double) $vec.getFloat($base + $i)"
        else s"$vec.getDouble($base + $i)"
      val getNull =
        if (mayHaveNulls) s"($vec.isNullAt($base + $i) ? 0.0 : $get)" else get
      s"""
         |long[] $codes = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $dsub;
         |  int $lim = java.lang.Math.max(0,
         |    java.lang.Math.min($dsub, $vec.numElements() - $base));
         |  double $bestD = 0.0; long $bestC = 0L; boolean $first = true;
         |  for (int $t = 0; $t < $ksub; $t++) {
         |    double[] $cv = $booksRef[$j][$t];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $s += $getNull * $cv[$i];
         |    }
         |    double $d = -2.0 * $s + $normsRef[$j][$t];
         |    if ($first || java.lang.Double.compare($d, $bestD) < 0) {
         |      $bestD = $d; $bestC = (long) $t; $first = false;
         |    }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
}

/** JVM-static helpers shared by interpreted eval and generated code.
  * Loop-heavy expression bodies live HERE and `doGenCode` emits a
  * one-line call: the generated projection method stays tiny (JIT-
  * friendly regardless of how many such expressions a stage fuses) and
  * eval/codegen cannot drift apart — the r19 PqCodes profiling showed
  * exactly what an over-large generated method costs (cold bytecode). */
object ExprHelpers {

  /** Bit i (0..15) set iff hex char i of `s` is in [8-9a-fA-F] — i.e.
    * the high bit of the i-th nibble of a hex digest. One pass over the
    * bytes; replaces 16 substring+isin subtree evaluations per row in
    * the SimHash vote projection. Strings shorter than 16 chars vote 0
    * on the missing positions (md5 hex is always 32). */
  def hexVotes16(s: UTF8String): Int = {
    val n = math.min(16, s.numBytes())
    var m = 0
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if ((c >= '8' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')) m |= (1 << i)
      i += 1
    }
    m
  }

  /** Apply a BPE merge list to a symbol array: for each (a, b) in rank
    * order, one greedy left-to-right non-overlapping adjacent-merge pass
    * — EXACTLY [[graft.operators.TextAnalysis.mergeAdjacent]]'s carry
    * semantics ("a a a" → ["aa", "a"]; a null element never matches,
    * flushes a pending carry, and is copied through). Arrays ping-pong;
    * sizes only shrink. */
  def bpeApplyMerges(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                     a: Array[UTF8String], b: Array[UTF8String],
                     ab: Array[UTF8String]): GenericArrayData = {
    var n = arr.numElements()
    var cur = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    var k = 0
    while (k < a.length) {
      val ak = a(k); val bk = b(k); val abk = ab(k)
      val out = new Array[AnyRef](n)
      var m = 0
      var carry: AnyRef = null // non-null iff a pending `a` may merge
      var j = 0
      while (j < n) {
        val x = cur(j)
        if (carry == null) {
          if (x != null && x.equals(ak)) carry = x
          else { out(m) = x; m += 1 }
        } else {
          if (x != null && x.equals(bk)) { out(m) = abk; m += 1; carry = null }
          else if (x != null && x.equals(ak)) { out(m) = carry; m += 1; carry = x }
          else { out(m) = carry; m += 1; out(m) = x; m += 1; carry = null }
        }
        j += 1
      }
      if (carry != null) { out(m) = carry; m += 1 }
      cur = out; n = m
      k += 1
    }
    if (n < cur.length) cur = java.util.Arrays.copyOf(cur, n)
    new GenericArrayData(cur)
  }

  def utf32Encode(input: UTF8String, bigEndian: Boolean): Array[Byte] = {
    val cps = input.toString.codePoints().toArray
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

  def utf32Decode(bytes: Array[Byte], bigEndian: Boolean): UTF8String = {
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
}

/** SimHash-16 hex votes as ONE native expression: bit i of the result
  * is set iff hex char i of the input is in [8-f] — the per-token vote
  * mask the 16 per-bit sums then read with shift/and. Replaces 16
  * `substring(h, i+1, 1).isin("8"…"f")` subtrees (16 UTF8String slices
  * + up to 128 string compares per row) with one byte loop (§4:
  * eliminate expensive expression forests in the hot path). */
case class HexVotes16Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hex_votes16"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.hexVotes16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.hexVotes16($c);")

  override protected def withNewChildInternal(newChild: Expression): HexVotes16Expr =
    copy(child = newChild)
}

/** A full BPE merge list applied to a symbol array as ONE native
  * expression — per word: one tight loop per merge over a ping-pong
  * pair of arrays, instead of nMerges interpreted `aggregate` HOF
  * passes each allocating a struct carry + array concat per element
  * (§4). Semantics are exactly the chained
  * [[graft.operators.TextAnalysis.mergeAdjacent]] folds it replaces
  * (greedy left-to-right, non-overlapping, carry may re-arm on `a`),
  * pinned against the HOF form in ExpressionSpec. The merge list is
  * constructor data (like [[PqCodesExpr]]'s codebook) and must not be
  * mutated after construction; case-class equality on it is
  * reference-based — conservative (missed subexpression elimination),
  * never incorrect. */
case class BpeMergesExpr(child: Expression, merges: Array[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "graft_bpe_merges"

  @transient private lazy val aArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1))
  @transient private lazy val bArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2))
  @transient private lazy val abArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${child.dataType.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.bpeApplyMerges(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      aArr, bArr, abArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String[]"
    val aRef = ctx.addReferenceObj("bpeA", aArr, cls)
    val bRef = ctx.addReferenceObj("bpeB", bArr, cls)
    val abRef = ctx.addReferenceObj("bpeAb", abArr, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.bpeApplyMerges($c, $aRef, $bRef, $abRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergesExpr =
    copy(child = newChild)
}

case class Utf32Encode(child: Expression, bigEndian: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = if (bigEndian) "graft_utf32be_encode" else "graft_utf32le_encode"

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.utf32Encode(input.asInstanceOf[UTF8String], bigEndian)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.utf32Encode($c, $bigEndian);")

  override protected def withNewChildInternal(newChild: Expression): Utf32Encode =
    copy(child = newChild)
}

case class Utf32Decode(child: Expression, bigEndian: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (bigEndian) "graft_utf32be_decode" else "graft_utf32le_decode"

  override def nullSafeEval(input: Any): Any =
    ExprHelpers.utf32Decode(input.asInstanceOf[Array[Byte]], bigEndian)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExprHelpers.utf32Decode($c, $bigEndian);")

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
/** Identity expression DECLARED non-deterministic — an optimizer
  * barrier. Use case (r19, measured on the ADC rankers): the optimizer
  * collapses a scoring projection into the input expressions of a
  * following `udaf` aggregate (ObjectHashAggregate), where they are
  * evaluated WITHOUT whole-stage codegen — per-row interpreted
  * evaluation of a 30-node scoring tree cost ~100 µs/row (q80: 2.3 s
  * for a 20k-row ranking whose projection alone ran in 0.17 s).
  * Wrapping the score in this barrier keeps the projection its own
  * codegen'd stage and hands the aggregate a plain attribute. Identity
  * semantics: same value, nullability and codegen as the child; only
  * the determinism flag differs, and the value IS deterministic — the
  * flag is load-bearing solely against expression inlining (the same
  * trick as `asNondeterministic()` on an expensive UDF, guide §4.4). */
case class EvalBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_barrier"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalBarrier =
    copy(child = newChild)
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // CONSTRAINT (r19 verdict): the non-determinism flag that stops the
    // optimizer inlining the barrier's child into an aggregate's input
    // ALSO blocks predicate pushdown through any projection containing
    // it — a filter written above a barrier column stays above it. Only
    // place graft_barrier immediately upstream of the consumer it
    // shields (an aggregate/udaf input); never upstream of a selective
    // filter that should reach the scan. Every current call site sits
    // directly under an aggregation (ExpressionSpec pins the plan shape).
    reg.createOrReplaceTempFunction("graft_barrier",
      exprs => EvalBarrier(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_hex_votes16",
      exprs => HexVotes16Expr(exprs.head), "built-in")
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
