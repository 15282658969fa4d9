package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot extension kernels.
  *
  * The composable built-in formulation (nested `transform`/`aggregate`
  * lambdas) is evaluated per-element through the interpreted higher-order
  * function path — measured ~30s for MinHash signatures over 5k documents.
  * These expressions run the same math as tight JVM loops over `ArrayData`
  * (no per-element boxing, no lambda dispatch), 100-1000× faster, and keep
  * the DataFrame API surface unchanged. Every expression participates in
  * whole-stage codegen: `DotProductF` inlines its loop via `doGenCode`; the
  * hash family emits one static call into `HashKernels` per row, so no
  * operator ever falls back to interpreted row-at-a-time eval.
  */

/** Dot product of two `array<float>` columns accumulated in double. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Dot product over `array<double>` inputs — the reduced-space scoring
  * primitive (see [[DotProductF]] for the float-array variant; same
  * min-length and null-element contracts).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.dotD($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** Deterministic md5-seeded ±1 random projection: `array<float>` →
  * `array<double>` of length dimOut, all planes in one pass. The sign
  * matrix is derived from (dimIn, dimOut, seed) via md5 (see
  * `HashKernels.rprojSignsFlat`) — nothing is broadcast or shuffled, and
  * any engine can rebuild the matrix to audit or probe a materialized
  * reduced-space index. Replaces the composed form (dimOut separate
  * literal-plane dot products), whose expression tree re-evaluated every
  * plane per reference and dominated the rproj query family.
  */
case class RandomProjectF(child: Expression, dimIn: Int, dimOut: Int, seed: String)
    extends UnaryExpression {
  require(dimIn > 0 && dimOut > 0, s"bad dims $dimIn x $dimOut")

  @transient private lazy val m: Array[Float] =
    HashKernels.rprojSignsFlat(dimIn, dimOut, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project_f"

  override def nullSafeEval(v: Any): Any =
    HashKernels.randomProjectF(v.asInstanceOf[ArrayData], m, dimIn, dimOut)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("signsFlat", m, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HashKernels.randomProjectF($v, $mRef, $dimIn, $dimOut);")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectF =
    copy(child = newChild)
}

/** MinHash signature: for permutation i in [0,k), sig[i] = min over
  * shingles s of xxhash64(s, seed=i). Input `array<string>`, output
  * `array<bigint>` of length k (empty input → MaxValue sentinels).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(in: Any): Any =
    HashKernels.minHashSig(in.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minHashSig($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-bit majority vote of each token's
  * xxhash64, packed into one long.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(in: Any): Any =
    HashKernels.simHash64(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Portable 60-bit md5-derived hash, shared by the cross-engine-replayable
  * expression variants: the value of the first 15 hex digits of md5(input),
  * identical to DuckDB's `('0x' || substr(md5(x), 1, 15))::BIGINT` and to
  * Spark SQL's `conv(substring(md5(x), 1, 15), 16, 10)`. 60 bits keeps every
  * value non-negative and safely inside BIGINT in both engines.
  */
object Md5Utils {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Raw 16-byte md5 digest (thread-local MessageDigest, no allocation churn). */
  def digest128(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  /** First 60 bits of md5(bytes): first 8 digest bytes big-endian >>> 4. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = digest128(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** [[hash60]] of a byte slice, digesting in place (no slice copy). */
  def hash60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  def hash60(s: String): Long =
    hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** [[hash60]] of slice1 ++ sep ++ slice2, digested incrementally (no
    * concatenated copy) — the bigram-feature hash: identical to
    * md5(tok1 || sep || tok2) over the UTF-8 bytes.
    */
  def hash60Joined(bytes: Array[Byte], s1: Int, l1: Int, sep: Byte,
      s2: Int, l2: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, s1, l1)
    md.update(sep)
    md.update(bytes, s2, l2)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  val Mask55: Long = (1L << 55) - 1
  val Mask60: Long = (1L << 60) - 1
}

/** Per-row JVM kernels shared by interpreted eval and generated code. Each
  * expression's `doGenCode` emits ONE static call into this object (Scala
  * emits static forwarders for top-level objects, so the generated Java can
  * call `graft.functions.HashKernels.xxx(...)` directly). That keeps the
  * surrounding operator inside WholeStageCodegen — under `CodegenFallback`
  * these expressions forced a fallback split that boxed every input row and
  * re-entered interpreted eval per row, and they dominated the four slowest
  * bench queries (q30/q31/q42).
  */
object HashKernels {

  /** xxhash64 MinHash: sig[i] = min over shingles of xxhash64(s, seed=i). */
  def minHashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash: per-bit majority vote of each token's xxhash64. */
  def simHash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Portable KM double-hash MinHash (see MinHashSigP scaladoc). */
  def minHashSigP(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val d = Md5Utils.digest128(arr.getUTF8String(j).getBytes)
        var a = 0L
        var b = 0L
        var t = 0
        while (t < 8) { a = (a << 8) | (d(t) & 0xFFL); t += 1 }
        while (t < 16) { b = (b << 8) | (d(t) & 0xFFL); t += 1 }
        a >>>= 4
        val bm = (b >>> 4) & Md5Utils.Mask55
        var h = a
        var i = 0
        while (i < k) {
          val hv = h & Md5Utils.Mask60
          if (hv < sig(i)) sig(i) = hv
          i += 1
          h += bm
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Portable 60-bit SimHash: per-bit majority vote of md5-60 token hashes. */
  def simHash60P(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = Md5Utils.hash60(arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  // one Rademacher plane matrix per (planes, dim) per executor JVM,
  // derived from the md5 parity the DuckDB oracle replays
  private val matrixCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Boolean]]]()

  private def matrix(planes: Int, dim: Int): Array[Array[Boolean]] =
    matrixCache.computeIfAbsent((planes.toLong << 32) | dim, _ =>
      Array.tabulate(planes, dim)((p, k) =>
        (Md5Utils.hash60(s"$p,$k") & 1L) == 1L))

  /** All `planes` hyperplane sign bits of a float vector in one pass. */
  def hyperplaneSignBits(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    val m = matrix(planes, n)
    // materialize once: null elements contribute 0 regardless of physical
    // representation (UnsafeArrayData reads 0.0 at null slots but
    // GenericArrayData would NPE — behavior must not depend on which one
    // arrives), and the plane loop then runs over a primitive array
    val xs = new Array[Double](n)
    var k = 0
    while (k < n) {
      if (!v.isNullAt(k)) xs(k) = v.getFloat(k).toDouble
      k += 1
    }
    var bits = 0L
    var p = 0
    while (p < planes) {
      val row = m(p)
      var s = 0.0
      k = 0
      while (k < n) {
        if (row(k)) s += xs(k) else s -= xs(k)
        k += 1
      }
      if (s >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Deterministic ±1 sign matrix, flattened row-major (dimOut × dimIn):
    * entry (j, k) is +1 iff the first hex nibble of md5("seed|j|k") is
    * < 8 — the same md5-replayable derivation as
    * `Similarity.rprojSigns` (which delegates here), so an external
    * engine can rebuild the matrix from (dimIn, dimOut, seed) alone.
    */
  def rprojSignsFlat(dimIn: Int, dimOut: Int, seed: String): Array[Float] = {
    val m = new Array[Float](dimOut * dimIn)
    var j = 0
    while (j < dimOut) {
      var k = 0
      while (k < dimIn) {
        val d = Md5Utils.digest128(
          s"$seed|$j|$k".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        m(j * dimIn + k) = if (((d(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
        k += 1
      }
      j += 1
    }
    m
  }

  /** Project a float vector through the flattened sign matrix: all dimOut
    * accumulations in one pass over the input. Rows shorter than dimIn
    * project their available prefix (DotProductF's min-length contract);
    * null elements contribute 0 regardless of physical representation.
    */
  def randomProjectF(v: ArrayData, m: Array[Float], dimIn: Int, dimOut: Int): ArrayData = {
    val n = math.min(v.numElements(), dimIn)
    val out = new Array[Double](dimOut)
    var j = 0
    while (j < dimOut) {
      var s = 0.0
      val base = j * dimIn
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += v.getFloat(i).toDouble * m(base + i).toDouble
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Dot product over double arrays (min-length contract, like DotProductF). */
  def dotD(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  /** Whitespace tokens: split on single spaces, empty segments dropped —
    * byte-identical to `filter(split(text, " "), t => t =!= "")` and to
    * DuckDB's `list_filter(string_split(text, ' '), x -> x <> '')`, but
    * without the per-token interpreted-lambda dispatch of the HOF path.
    * Splitting at the ASCII space byte is UTF-8 safe (0x20 never occurs
    * inside a multi-byte sequence).
    */
  def whitespaceTokens(in: UTF8String): ArrayData = {
    val parts = in.split(UTF8String.fromString(" "), -1)
    var n = 0
    var i = 0
    while (i < parts.length) { if (parts(i).numBytes() > 0) n += 1; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).numBytes() > 0) { out(j) = parts(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed unigram+bigram feature buckets (the DSIR feature kernel):
    * lowercase, split on single spaces (empties dropped — the same
    * tokenization as `string_split(lower(text), ' ')` + filter), then
    * for every token emit md5-60(token) mod `buckets` and for every
    * adjacent pair md5-60(tok1 '_' tok2) mod `buckets`. Bag semantics
    * (duplicates kept), unigrams first then bigrams. One pass over the
    * lowered UTF-8 bytes, one thread-local digest per feature, no
    * string churn — replaces a split + transform + concat + md5 + conv
    * column chain that dominated the DSIR scan. Byte-identical to the
    * column formulation and to the DuckDB oracle's
    * `('0x' || substr(md5(f), 1, 15))::BIGINT % buckets`.
    */
  def ngramBuckets(in: UTF8String, buckets: Int): ArrayData = {
    val bytes = in.toLowerCase.getBytes
    // token spans over the raw bytes: split on 0x20 (a UTF-8
    // continuation byte can never be 0x20, so byte-split == char-split)
    var nTok = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        nTok += 1
        while (i < bytes.length && bytes(i) != 0x20) i += 1
      } else i += 1
    }
    if (nTok == 0) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTok)
    val lens = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20) {
        starts(t) = i
        while (i < bytes.length && bytes(i) != 0x20) i += 1
        lens(t) = i - starts(t)
        t += 1
      } else i += 1
    }
    val out = new Array[Long](nTok + (nTok - 1))
    i = 0
    while (i < nTok) {
      out(i) = Md5Utils.hash60(bytes, starts(i), lens(i)) % buckets
      i += 1
    }
    i = 0
    while (i < nTok - 1) {
      out(nTok + i) = Md5Utils.hash60Joined(bytes, starts(i), lens(i),
        '_'.toByte, starts(i + 1), lens(i + 1)) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of array elements present in `set` (nulls don't count). */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Symmetric int8 truncation quantization: (scale = max|v|/127,
    * q_i = trunc(v_i/scale)) in two tight passes. Null elements contribute
    * nothing to the scale and quantize to 0.
    */
  def quantizeInt8(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(arr.getFloat(i).toDouble)
        if (v > maxabs) maxabs = v
      }
      i += 1
    }
    val scale = maxabs / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (maxabs == 0.0 || arr.isNullAt(i)) 0
        else (arr.getFloat(i).toDouble / scale).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(scale, new GenericArrayData(out))
  }

  /** Distinct sliding word n-gram shingles (see WordShingles scaladoc). */
  /** Adjacent token pairs WITH duplicates (repetition-signal bigrams —
    * unlike `wordShingles`, whose dedup is MinHash semantics). Null
    * elements participate as empty strings to keep behavior independent
    * of the array's physical representation.
    */
  def adjacentBigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val empty = UTF8String.EMPTY_UTF8
    val space = UTF8String.fromString(" ")
    def at(i: Int): UTF8String =
      if (arr.isNullAt(i)) empty else arr.getUTF8String(i)
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(at(i), space, at(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass token frequency stats over a string array: total count,
    * distinct count, and the top single-element frequency — the per-doc
    * repetition signals WITHOUT an explode/groupBy (each document's tokens
    * are already co-located in its row, so a per-row hashmap replaces two
    * corpus-wide shuffles). Null elements count as empty strings.
    */
  def tokenFreqStats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var top = 0
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      var c = counts.get(t)
      if (c == null) { c = new Array[Int](1); counts.put(t, c) }
      c(0) += 1
      if (c(0) > top) top = c(0)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n.toLong, counts.size.toLong, top.toLong)
  }

  def wordShingles(in: UTF8String, n: Int): ArrayData = {
    val toks = in.toString.split(' ').iterator.filter(_.nonEmpty).toArray
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) {
      seen.add(toks.mkString(" "))
    } else {
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Product-quantization codes in one pass: for each of the m subspaces
    * (sub = dim/m floats), the index of the codebook entry minimizing the
    * squared L2 distance, ties to the smaller index. `books` is the
    * flattened codebook array laid out [(s · k + c) · sub + j]. Term
    * order matches the composable zip_with/dotD formulation exactly:
    * per element, (v − c) in double, squared, accumulated left to right —
    * so the DuckDB oracle replays the codes bit-identically.
    */
  def pqEncodeF(v: ArrayData, books: Array[Float], m: Int, k: Int): ArrayData = {
    val dim = v.numElements()
    val sub = dim / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var acc = 0.0
        var j = 0
        while (j < sub) {
          val d = v.getFloat(s * sub + j).toDouble - books(base + j).toDouble
          acc += d * d
          j += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-centroid L2 norms of a flattened centroid matrix laid out
    * [cid · dim + j] — precomputed once per plan (expression-side lazy
    * val), never per row.
    */
  def centroidNorms(flat: Array[Float], nlist: Int): Array[Double] = {
    val dim = flat.length / nlist
    val out = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val x = flat(c * dim + j).toDouble
        acc += x * x
        j += 1
      }
      out(c) = math.sqrt(acc)
      c += 1
    }
    out
  }

  /** Spark SQL's double ordering (SQLOrderingUtil.compareDoubles): NaN
    * greater than everything including +∞, NaN == NaN, -0.0 == 0.0.
    * Ranking sims with THIS comparator keeps the kernel bit-agreed with
    * the literal `array_max`-over-(sim, cid)-structs form on NaN rows
    * too: a NaN vector makes every sim NaN, struct-max ties to the
    * larger cid — so both physical forms assign the LARGEST cid, where
    * a plain `>=` scan (NaN comparisons all false) used to fall back to
    * ascending-cid and the two paths diverged.
    */
  private def cmpSimD(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  /** The `nprobe` centroid ids nearest to `v` by cosine, in rank order
    * (sim desc; ties toward the larger cid when `tiesLarger`, matching
    * `array_max` over (sim, cid) structs — the assignment convention —
    * else toward the smaller cid, the probe-selection convention).
    * NaN sims rank via [[cmpSimD]] (NaN-greatest), so both physical
    * assignment forms agree on NaN vectors.
    * Cosine matches the Column formulation exactly: per-element double
    * products accumulated left to right, sim = dot / (|v|·|c|) with the
    * PRODUCT of norms tested against zero. One tight loop per row
    * replaces an nlist-entry literal-struct array whose expression tree
    * grows with the centroid count — at the √N-sized centroid lists
    * `Similarity.indexParams` derives (hundreds to tens of thousands),
    * the literal form is unanalyzable.
    */
  def nearestCentroidsF(v: ArrayData, flat: Array[Float], norms: Array[Double],
      nprobe: Int, tiesLarger: Boolean): ArrayData = {
    val nlist = norms.length
    val dim = flat.length / nlist
    val n = math.min(dim, v.numElements())
    var vacc = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = v.getFloat(i).toDouble
      vacc += x * x
      i += 1
    }
    val vn = math.sqrt(vacc)
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += v.getFloat(j).toDouble * flat(c * dim + j).toDouble
        j += 1
      }
      val nn = vn * norms(c)
      sims(c) = if (nn == 0.0) 0.0 else dot / nn
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nlist)
    var slot = 0
    while (slot < k) {
      var best = Double.NegativeInfinity
      var bestC = -1
      c = 0
      while (c < nlist) {
        if (!taken(c)) {
          val cmp = if (bestC == -1) 1 else cmpSimD(sims(c), best)
          if (cmp > 0 || (cmp == 0 && tiesLarger)) {
            best = sims(c)
            bestC = c
          }
        }
        c += 1
      }
      taken(bestC) = true
      out(slot) = bestC
      slot += 1
    }
    new GenericArrayData(out)
  }

  /** Start offset of each CODE POINT in a UTF-8 byte array, plus a
    * trailing `bytes.length` sentinel — code point i spans bytes
    * [off(i), off(i+1)). A UTF-8 continuation byte is (b & 0xC0) ==
    * 0x80; every other byte starts a code point. One pass, one int per
    * code point — negligible next to the per-window md5 below.
    */
  private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    var cp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) cp += 1
      i += 1
    }
    val off = new Array[Int](cp + 1)
    var j = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { off(j) = i; j += 1 }
      i += 1
    }
    off(cp) = bytes.length
    off
  }

  /** Content-sampled character L-gram fingerprints: the md5-60 hash of
    * every length-`gramLen` CODE-POINT window of the string whose hash
    * is ≡ 0 (mod `modP`), distinct, in first-occurrence order.
    * Selection depends only on the window's BYTES — never its position
    * — so a verbatim run shared by two documents contributes identical
    * fingerprints to both sides. One pass, one md5 per window on a
    * thread-local digest, windows digested in place from the UTF-8
    * bytes. Windows are counted in CODE POINTS (not UTF-16 units), the
    * same unit Spark SQL's `substring`/`length` and the DuckDB
    * oracle's `substr` use — so positions and window contents agree
    * across all three even on supplementary-plane (emoji) text.
    */
  def charGramHashes(in: UTF8String, gramLen: Int, modP: Int): ArrayData = {
    val bytes = in.getBytes
    // ASCII fast path (byte == code point): digest byte slices directly
    // with no offset table.
    if (bytes.length == in.numChars()) {
      val n = bytes.length - gramLen + 1
      if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < n) {
        val h = Md5Utils.hash60(bytes, i, gramLen)
        if (h % modP == 0) seen.add(h)
        i += 1
      }
      return hashSetToArray(seen)
    }
    val off = codePointOffsets(bytes)
    val n = off.length - gramLen // = numCodePoints - gramLen + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val h = Md5Utils.hash60(bytes, off(i), off(i + gramLen) - off(i))
      if (h % modP == 0) seen.add(h)
      i += 1
    }
    hashSetToArray(seen)
  }

  private def hashSetToArray(
      seen: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** [[charGramHashes]] with 1-based window positions and DUPLICATES
    * KEPT: one (pos, hash) struct per sampled window, in order — the
    * span-removal primitive (rewriting needs every covered position,
    * where pair generation needs each fingerprint once). Same hash,
    * same keep rule, same oracle replay. `pos` is a 1-based CODE-POINT
    * index — the unit `Dedup.removeSharedSubstrings` consumes via
    * Spark SQL `substring`/`length` (code-point semantics), so the
    * rewrite cuts the right spans even on supplementary-plane text.
    */
  def charGramPosHashes(in: UTF8String, gramLen: Int, modP: Int): ArrayData = {
    val bytes = in.getBytes
    val rows = new java.util.ArrayList[Any]()
    if (bytes.length == in.numChars()) {
      val n = bytes.length - gramLen + 1
      if (n <= 0) return new GenericArrayData(Array.empty[Any])
      var i = 0
      while (i < n) {
        val h = Md5Utils.hash60(bytes, i, gramLen)
        if (h % modP == 0) rows.add(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i + 1, h)))
        i += 1
      }
      return new GenericArrayData(rows.toArray)
    }
    val off = codePointOffsets(bytes)
    val n = off.length - gramLen
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    var i = 0
    while (i < n) {
      val h = Md5Utils.hash60(bytes, off(i), off(i + gramLen) - off(i))
      if (h % modP == 0) rows.add(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i + 1, h)))
      i += 1
    }
    new GenericArrayData(rows.toArray)
  }

  /** Hilbert-curve key of a 2-D point (the xy→d walk of the classic
    * per-bit rotate-and-reflect algorithm): both coordinates are masked
    * to their low `bits` bits, then each level contributes s²·((3·rx)⊕ry)
    * and rotates the sub-square. Pure integer arithmetic — any engine
    * replays the identical key (the DuckDB oracle unrolls the same loop
    * as per-bit CTE stages). vs the Morton/z-order key: consecutive
    * Hilbert keys are always ADJACENT cells (Morton jumps at power-of-2
    * boundaries), so range-partitioned files cover tighter rectangles
    * for the same key math.
    */
  def hilbertKey2(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }

  /** WINNOWED character-gram fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003): the md5-60 hash of every length-`k` code-point window,
    * winnowed with window size `w` — each run of `w` consecutive window
    * hashes selects its MINIMUM, rightmost occurrence on ties;
    * consecutive runs selecting the same position record it once.
    *
    * The point vs the mod-p sampler ([[charGramHashes]]): winnowing
    * GUARANTEES that two documents sharing a verbatim run of
    * ≥ w + k − 1 code points share at least one selected fingerprint,
    * at expected density 2/(w+1) — the mod-p sampler is cheaper and
    * position-independent too, but misses any single shared run with
    * probability (1−1/p)^windows. Documents with fewer than `w` windows
    * winnow over the single window of all their hashes, so short
    * documents still fingerprint.
    *
    * One pass over the text: a monotonic deque (ring buffers of size
    * w+1) yields O(n) time and O(w) space — the unwinnowed hash
    * sequence is never materialized, here or anywhere in the plan.
    * Output: (pos, gh) structs, strictly increasing 1-based code-point
    * positions (deque fronts only move forward, so per-window winners
    * arrive pre-deduplicated and ordered).
    */
  def charGramWinnow(in: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = in.getBytes
    val ascii = bytes.length == in.numChars()
    val off = if (ascii) null else codePointOffsets(bytes)
    val nWin = (if (ascii) bytes.length else off.length - 1) - k + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val we = math.min(w, nWin)
    val cap = we + 1
    val dqIdx = new Array[Int](cap)
    val dqHash = new Array[Long](cap)
    var head = 0
    var tail = 0 // deque is [head, tail), ring-indexed mod cap
    var lastSel = -1
    val rows = new java.util.ArrayList[Any]()
    var j = 0
    while (j < nWin) {
      val h =
        if (ascii) Md5Utils.hash60(bytes, j, k)
        else Md5Utils.hash60(bytes, off(j), off(j + k) - off(j))
      // `>=` pop: equal minima are superseded by the newer (righter) index
      while (tail > head && dqHash((tail - 1) % cap) >= h) tail -= 1
      dqIdx(tail % cap) = j
      dqHash(tail % cap) = h
      tail += 1
      val t = j - we + 1
      if (t >= 0) {
        while (dqIdx(head % cap) < t) head += 1
        val sel = dqIdx(head % cap)
        if (sel != lastSel) {
          rows.add(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](sel + 1, dqHash(head % cap))))
          lastSel = sel
        }
      }
      j += 1
    }
    new GenericArrayData(rows.toArray)
  }

  /** Bucket of `v` under a sorted boundary table: the bucket paired with
    * the GREATEST boundary ≤ v (binary search; v below every boundary
    * takes the first bucket — callers build boundaries from the same
    * corpus, so that case only arises from float noise). One O(log b)
    * probe per row replaces a corpus-sized shuffle join against the
    * (value → bucket) map.
    *
    * NaN takes the LAST bucket: both Spark and DuckDB sort NaN greater
    * than every double and group all NaNs together, so when the corpus
    * contains NaN its histogram bucket is the top-ranked one and its
    * boundary (being the per-bucket min) sorts last — the join form's
    * NaN-equality assignment lands there, and this kernel must agree.
    * A NaN boundary never captures a non-NaN value (NaN comparisons are
    * false, so the search can't step onto it).
    */
  def sortedBucketOf(v: Double, bounds: Array[Double],
      buckets: Array[Long]): Long = {
    if (java.lang.Double.isNaN(v)) return buckets(bounds.length - 1)
    var lo = 0
    var hi = bounds.length - 1
    if (hi <= 0 || v < bounds(0)) return buckets(0)
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (bounds(mid) <= v) lo = mid else hi = mid - 1
    }
    buckets(lo)
  }

  /** [[sortedBucketOf]] over 64-bit integer boundaries — the exact form
    * for integral layout columns: a double-valued boundary table is only
    * exact below 2^53, while surrogate/hash-spread ids use the full long
    * range. Same greatest-boundary-≤-v search, no NaN case.
    */
  def sortedBucketOfLong(v: Long, bounds: Array[Long],
      buckets: Array[Long]): Long = {
    var lo = 0
    var hi = bounds.length - 1
    if (hi <= 0 || v < bounds(0)) return buckets(0)
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (bounds(mid) <= v) lo = mid else hi = mid - 1
    }
    buckets(lo)
  }
}

/** Portable MinHash signature via Kirsch–Mitzenmacher double hashing: each
  * shingle is md5'd ONCE, its digest split into two 60-bit halves
  * a = hex[1..15], b = hex[17..31], and the k family members are
  * h_i = (a + i * (b & 2^55-1)) & (2^60-1) — KM double hashing gives the
  * same LSH banding guarantees as k independent hashes at 1/k the digest
  * cost, and every step is replayable by a DuckDB oracle:
  * `(('0x'||substr(md5(s),1,15))::BIGINT +
  *   i * (('0x'||substr(md5(s),17,15))::BIGINT & 36028797018963967))
  *  & 1152921504606846975`.
  * The 55-bit mask on b bounds i*b + a below 2^63 (no overflow in either
  * engine). An xxhash64 variant exists as `MinHashSig` for pipelines that
  * don't need cross-engine replay.
  */
case class MinHashSigP(child: Expression, k: Int)
    extends UnaryExpression {
  // k ≤ 224 keeps a + (k-1)·(b & 2^55-1) < 2^63: beyond that the JVM sum
  // silently wraps while the DuckDB replay raises BIGINT overflow — the
  // cross-engine portability guarantee would quietly break.
  require(k >= 1 && k <= 224, s"k must be in [1, 224], got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_p"

  override def nullSafeEval(in: Any): Any =
    HashKernels.minHashSigP(in.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minHashSigP($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigP =
    copy(child = newChild)
}

/** Portable 60-bit SimHash: per-bit majority vote of each token's
  * `Md5Utils.hash60`, packed into one long (bit j set iff the vote sum is
  * strictly positive). 60 bits instead of 64 so the token hash — and
  * therefore the whole computation — is replayable by a DuckDB oracle.
  */
case class SimHash60P(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60_p"

  override def nullSafeEval(in: Any): Any =
    HashKernels.simHash60P(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simHash60P($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60P =
    copy(child = newChild)
}

/** All `planes` Rademacher-hyperplane sign bits of an `array<float>` vector
  * in ONE pass, packed into a long bitmask (bit p = 1 iff
  * Σ_k r[p][k]·v[k] >= 0, r[p][k] = ±1 from bit 0 of md5-60("p,k")).
  *
  * Replaces a per-plane `DotProductF(vec, <64-literal array>)` column
  * formulation whose 4096 literal nodes fell out of codegen and were
  * re-evaluated interpreted per row. The plane matrix is derived once per
  * executor (lazily, at the first row's dimensionality) from the same md5
  * parity the DuckDB oracle uses, so the result is replayed bit-exactly:
  * adding/subtracting v[k] equals multiplying by ±1.0 exactly, in the same
  * index order as the oracle's sequential `list_sum`.
  */
case class HyperplaneSignBits(child: Expression, planes: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64, "planes must fit a long bitmask")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sign_bits"

  override def nullSafeEval(in: Any): Any =
    HashKernels.hyperplaneSignBits(in.asInstanceOf[ArrayData], planes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.hyperplaneSignBits($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBits =
    copy(child = newChild)
}

/** Distinct sliding word n-gram shingles of a whitespace-tokenized string.
  * Semantics match the composable version: tokens are space-separated,
  * empties dropped; documents with fewer than n tokens contribute their
  * whole token sequence as a single shingle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(in: Any): Any =
    HashKernels.wordShingles(in.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Content-sampled character-gram fingerprints (see
  * `HashKernels.charGramHashes`): the exact-substring dedup primitive.
  * Every step is replayable by a DuckDB oracle —
  * `('0x' || substr(md5(substr(text, i, gramLen)), 1, 15))::BIGINT` with
  * the same mod-`modP` keep rule.
  */
case class CharGramHashes(child: Expression, gramLen: Int, modP: Int)
    extends UnaryExpression {
  require(gramLen >= 1, s"gramLen must be positive, got $gramLen")
  require(modP >= 1, s"modP must be positive, got $modP")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(in: Any): Any =
    HashKernels.charGramHashes(in.asInstanceOf[UTF8String], gramLen, modP)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.charGramHashes($c, $gramLen, $modP);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** Hashed unigram+bigram feature buckets (see `HashKernels.ngramBuckets`):
  * the DSIR bag-of-hashed-ngrams feature extractor as one codegen'd pass.
  */
case class NgramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be positive, got $buckets")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_buckets"

  override def nullSafeEval(in: Any): Any =
    HashKernels.ngramBuckets(in.asInstanceOf[UTF8String], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.ngramBuckets($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): NgramBuckets =
    copy(child = newChild)
}

/** Positioned content-sampled character-gram fingerprints (see
  * `HashKernels.charGramPosHashes`): (pos, gh) structs, duplicates
  * kept — the exact-substring SPAN-REMOVAL primitive.
  */
case class CharGramPosHashes(child: Expression, gramLen: Int, modP: Int)
    extends UnaryExpression {
  require(gramLen >= 1, s"gramLen must be positive, got $gramLen")
  require(modP >= 1, s"modP must be positive, got $modP")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gh", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "char_gram_pos_hashes"

  override def nullSafeEval(in: Any): Any =
    HashKernels.charGramPosHashes(in.asInstanceOf[UTF8String], gramLen, modP)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.charGramPosHashes($c, $gramLen, $modP);")

  override protected def withNewChildInternal(newChild: Expression): CharGramPosHashes =
    copy(child = newChild)
}

/** Hilbert-curve 2-D key (see `HashKernels.hilbertKey2`): integer-exact
  * rotate-and-reflect walk; adjacent keys are adjacent cells.
  */
case class HilbertKey2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key2"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.hilbertKey2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.hilbertKey2($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey2 =
    copy(left = newLeft, right = newRight)
}

/** Winnowed character-gram fingerprints (see
  * `HashKernels.charGramWinnow`): rightmost-min-per-window selection
  * with the w+k−1 shared-run detection guarantee, O(w) space.
  */
case class CharGramWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be positive, got $k")
  require(w >= 1, s"w must be positive, got $w")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gh", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "char_gram_winnow"

  override def nullSafeEval(in: Any): Any =
    HashKernels.charGramWinnow(in.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.charGramWinnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): CharGramWinnow =
    copy(child = newChild)
}

/** Adjacent token-pair bigrams, duplicates kept (see
  * `HashKernels.adjacentBigrams`): the per-pair `zip_with(slice, slice,
  * concat)` HOF formulation pays an interpreted lambda per token.
  */
case class AdjacentBigrams(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_bigrams"

  override def nullSafeEval(in: Any): Any =
    HashKernels.adjacentBigrams(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.adjacentBigrams($c);")

  override protected def withNewChildInternal(newChild: Expression): AdjacentBigrams =
    copy(child = newChild)
}

/** One-pass per-row token frequency stats (see
  * `HashKernels.tokenFreqStats`): struct(n_total, n_distinct, top_freq).
  * Turns the repetition-signal aggregation from two explode→groupBy
  * shuffle chains into a shuffle-free scan projection.
  */
case class TokenFreqStats(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_freq", LongType, nullable = false)))
  override def prettyName: String = "token_freq_stats"

  override def nullSafeEval(in: Any): Any =
    HashKernels.tokenFreqStats(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.tokenFreqStats($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenFreqStats =
    copy(child = newChild)
}

/** Whitespace tokens (split on single spaces, empties dropped) as a native
  * expression — semantics of `filter(split(text, " "), _ =!= "")` without
  * the interpreted per-token lambda (the HOF path dominated the langid /
  * quality profile: ~13 ms/doc on long documents).
  */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "whitespace_tokens"

  override def nullSafeEval(in: Any): Any =
    HashKernels.whitespaceTokens(in.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.whitespaceTokens($c);")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** Product-quantization codes (see `HashKernels.pqEncodeF`): the
  * per-subspace argmin-L2 codebook assignment as one tight primitive
  * loop. The zip_with/dotD composition it replaces paid an interpreted
  * lambda per element per centroid (m·k·(dim/m) evals per row) and
  * dominated the PQ index build.
  */
case class PqEncodeF(child: Expression, books: Seq[Float], m: Int, k: Int)
    extends UnaryExpression {
  require(m >= 1 && k >= 1 && books.size % (m * k) == 0,
    s"flat codebook size ${books.size} must be a multiple of m*k = ${m * k}")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_f"

  @transient private lazy val flat: Array[Float] = books.toArray

  override def nullSafeEval(in: Any): Any =
    HashKernels.pqEncodeF(in.asInstanceOf[ArrayData], flat, m, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flat, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.pqEncodeF($c, $booksRef, $m, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeF =
    copy(child = newChild)
}

/** Top-`nprobe` nearest centroids by cosine (see
  * `HashKernels.nearestCentroidsF`): the flat centroid matrix and the
  * precomputed per-centroid norms ride as reference objects, so the plan
  * stays one expression node regardless of nlist — the literal-struct
  * `array_max` formulation builds an nlist·dim-literal tree that stops
  * being analyzable at the √N centroid counts
  * `graft.ext.Similarity.indexParams` derives.
  */
case class NearestCentroidsF(child: Expression, cents: Seq[Float], nlist: Int,
    nprobe: Int, tiesLarger: Boolean) extends UnaryExpression {
  require(nlist >= 1 && nprobe >= 1 && cents.size % nlist == 0,
    s"flat centroid size ${cents.size} must be a multiple of nlist = $nlist")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids_f"

  @transient private lazy val flat: Array[Float] = cents.toArray
  @transient private lazy val norms: Array[Double] =
    HashKernels.centroidNorms(flat, nlist)

  override def nullSafeEval(in: Any): Any =
    HashKernels.nearestCentroidsF(in.asInstanceOf[ArrayData], flat, norms,
      nprobe, tiesLarger)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "float[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.nearestCentroidsF($c, " +
        s"$flatRef, $normsRef, $nprobe, $tiesLarger);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsF =
    copy(child = newChild)
}

/** Count of array elements contained in a fixed keyword set (marker-token
  * voting, stopword counting). One tight hash-set loop per row instead of
  * `size(filter(arr, t => array_contains(lit-array, t)))`, whose lambda is
  * interpreted per element AND scans the keyword array linearly.
  */
case class ArrayCountIn(child: Expression, keywords: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_count_in"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](keywords.size * 2)
    keywords.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }

  override def nullSafeEval(in: Any): Any =
    HashKernels.countIn(in.asInstanceOf[ArrayData], set)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("kwSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.countIn($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayCountIn =
    copy(child = newChild)
}

/** Rank-quantile bucket via binary search over a broadcast boundary
  * table — the scalar side of `Layout`'s broadcast quantile-bucket
  * form: `bounds` (sorted ascending) and `buckets` are parallel arrays
  * of at most 2^16 entries collected from the bucket map's per-bucket
  * minima, and each row's bucket is the one paired with the greatest
  * boundary ≤ value. Replaces a corpus-sized shuffle join with a
  * codegen'd O(log b) probe. Values compare as doubles: exact for
  * doubles and for integral domains below 2^53 — wider integral keys
  * must use the join form.
  */
case class SortedBucketOf(child: Expression, bounds: Seq[Double],
    buckets: Seq[Long]) extends UnaryExpression {
  require(bounds.nonEmpty && bounds.size == buckets.size,
    s"bounds (${bounds.size}) and buckets (${buckets.size}) must be " +
      "parallel and non-empty")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires double, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_bucket_of"

  @transient private lazy val boundsArr: Array[Double] = bounds.toArray
  @transient private lazy val bucketsArr: Array[Long] = buckets.toArray

  override def nullSafeEval(in: Any): Any =
    HashKernels.sortedBucketOf(in.asInstanceOf[Double], boundsArr, bucketsArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("qBounds", boundsArr, "double[]")
    val kRef = ctx.addReferenceObj("qBuckets", bucketsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.sortedBucketOf($c, " +
        s"$bRef, $kRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedBucketOf =
    copy(child = newChild)
}

/** [[SortedBucketOf]] over 64-bit integer boundaries — the exact
  * broadcast-bucket probe for integral layout columns (surrogate keys,
  * hash-spread ids): comparing in long space never loses the low bits a
  * double cast drops above 2^53, so wide integral domains stay on the
  * join-free layout path instead of falling back to the corpus-sized
  * (value → bucket) shuffle join.
  */
case class SortedBucketOfLong(child: Expression, bounds: Seq[Long],
    buckets: Seq[Long]) extends UnaryExpression {
  require(bounds.nonEmpty && bounds.size == buckets.size,
    s"bounds (${bounds.size}) and buckets (${buckets.size}) must be " +
      "parallel and non-empty")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_bucket_of_long"

  @transient private lazy val boundsArr: Array[Long] = bounds.toArray
  @transient private lazy val bucketsArr: Array[Long] = buckets.toArray

  override def nullSafeEval(in: Any): Any =
    HashKernels.sortedBucketOfLong(in.asInstanceOf[Long], boundsArr,
      bucketsArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("qBoundsL", boundsArr, "long[]")
    val kRef = ctx.addReferenceObj("qBucketsL", bucketsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.sortedBucketOfLong($c, " +
        s"$bRef, $kRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedBucketOfLong =
    copy(child = newChild)
}

/** Per-vector symmetric int8 quantization → struct(scale double,
  * q array<int>). The HOF formulation (array_max + two transforms) is
  * interpreted per element and dominated the SQ8 index build; this is the
  * same math as two tight loops. Truncation toward zero matches ANSI cast
  * and SQL TRUNC, so the DuckDB oracle replays it bit-exactly.
  */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_int8"

  override def nullSafeEval(in: Any): Any =
    HashKernels.quantizeInt8(in.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.quantizeInt8($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** Column-API entry points. */
object native {
  import org.apache.spark.sql.GraftBridge
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def dotF(a: Column, b: Column): Column =
    col(DotProductF(ex(a), ex(b)))
  def dotD(a: Column, b: Column): Column =
    col(DotProductD(ex(a), ex(b)))
  def randomProjectF(vec: Column, dimIn: Int, dimOut: Int, seed: String): Column =
    col(RandomProjectF(ex(vec), dimIn, dimOut, seed))
  def minHashSig(shingles: Column, k: Int): Column =
    col(MinHashSig(ex(shingles), k))
  def minHashSigP(shingles: Column, k: Int): Column =
    col(MinHashSigP(ex(shingles), k))
  def simHash64(tokens: Column): Column =
    col(SimHash64(ex(tokens)))
  def simHash60P(tokens: Column): Column =
    col(SimHash60P(ex(tokens)))
  def hyperplaneSignBits(vec: Column, planes: Int): Column =
    col(HyperplaneSignBits(ex(vec), planes))
  def wordShingles(text: Column, n: Int): Column =
    col(WordShingles(ex(text), n))
  def charGramHashes(text: Column, gramLen: Int, modP: Int): Column =
    col(CharGramHashes(ex(text), gramLen, modP))
  def charGramPosHashes(text: Column, gramLen: Int, modP: Int): Column =
    col(CharGramPosHashes(ex(text), gramLen, modP))
  def ngramBuckets(text: Column, buckets: Int): Column =
    col(NgramBuckets(ex(text), buckets))
  def charGramWinnow(text: Column, k: Int, w: Int): Column =
    col(CharGramWinnow(ex(text), k, w))
  def hilbertKey2(x: Column, y: Column, bits: Int): Column =
    col(HilbertKey2(ex(x), ex(y), bits))
  def pqEncodeF(vec: Column, books: Seq[Float], m: Int, k: Int): Column =
    col(PqEncodeF(ex(vec), books, m, k))
  def nearestCentroidsF(vec: Column, cents: Seq[Float], nlist: Int,
      nprobe: Int, tiesLarger: Boolean): Column =
    col(NearestCentroidsF(ex(vec), cents, nlist, nprobe, tiesLarger))
  def whitespaceTokens(text: Column): Column =
    col(WhitespaceTokens(ex(text)))
  def adjacentBigrams(arr: Column): Column =
    col(AdjacentBigrams(ex(arr)))
  def tokenFreqStats(arr: Column): Column =
    col(TokenFreqStats(ex(arr)))
  def arrayCountIn(arr: Column, keywords: Seq[String]): Column =
    col(ArrayCountIn(ex(arr), keywords))
  def quantizeInt8(vec: Column): Column =
    col(QuantizeInt8(ex(vec)))
  def sortedBucketOf(v: Column, bounds: Seq[Double],
      buckets: Seq[Long]): Column =
    col(SortedBucketOf(ex(v), bounds, buckets))
  def sortedBucketOfLong(v: Column, bounds: Seq[Long],
      buckets: Seq[Long]): Column =
    col(SortedBucketOfLong(ex(v), bounds, buckets))
  /** Catalyst's own exact long image of a decimal (`UnscaledValue` —
    * codegen'd, null-propagating): value · 10^scale as a long, lossless
    * and strictly monotone for any DecimalType with precision ≤ 18 (the
    * caller gates on that — wider decimals overflow the long). The
    * layout kernel's decimal route.
    */
  def unscaledLong(v: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.UnscaledValue(ex(v)))

  /** SQL-surface builders (integer literals become the Int parameters). */
  private[functions] def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product_f" -> { args => DotProductF(args(0), args(1)) },
    "dot_product_d" -> { args => DotProductD(args(0), args(1)) },
    "random_project_f" -> { args => RandomProjectF(args(0),
      intArg(args(1), "dimIn"), intArg(args(2), "dimOut"), stringArg(args(3), "seed")) },
    "minhash_sig" -> { args => MinHashSig(args(0), intArg(args(1), "k")) },
    "minhash_sig_p" -> { args => MinHashSigP(args(0), intArg(args(1), "k")) },
    "simhash64" -> { args => SimHash64(args(0)) },
    "simhash60_p" -> { args => SimHash60P(args(0)) },
    "hyperplane_sign_bits" -> { args => HyperplaneSignBits(args(0), intArg(args(1), "planes")) },
    "word_shingles" -> { args => WordShingles(args(0), intArg(args(1), "n")) },
    "char_gram_hashes" -> { args => CharGramHashes(args(0),
      intArg(args(1), "gramLen"), intArg(args(2), "modP")) },
    "char_gram_pos_hashes" -> { args => CharGramPosHashes(args(0),
      intArg(args(1), "gramLen"), intArg(args(2), "modP")) },
    "ngram_buckets" -> { args => NgramBuckets(args(0),
      intArg(args(1), "buckets")) },
    "char_gram_winnow" -> { args => CharGramWinnow(args(0),
      intArg(args(1), "k"), intArg(args(2), "w")) },
    "hilbert_key2" -> { args => HilbertKey2(args(0), args(1),
      intArg(args(2), "bits")) },
    "whitespace_tokens" -> { args => WhitespaceTokens(args(0)) },
    "adjacent_bigrams" -> { args => AdjacentBigrams(args(0)) },
    "token_freq_stats" -> { args => TokenFreqStats(args(0)) },
    "quantize_int8" -> { args => QuantizeInt8(args(0)) },
    "array_count_in" -> { args => ArrayCountIn(args(0), stringArrayArg(args(1), "keywords")) })

  /** SQL-surface builder: a string literal becomes the String parameter. */
  private[functions] def stringArg(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** SQL-surface builder: a string-array literal (array('a','b') or a
    * foldable literal) becomes the Seq[String] parameter.
    */
  private[functions] def stringArrayArg(e: Expression, what: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
      elems.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$what must be string literals, got $other")
      }
    case org.apache.spark.sql.catalyst.expressions.Literal(arr: ArrayData, ArrayType(StringType, _)) =>
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    case other => throw new IllegalArgumentException(
      s"$what must be a string-array literal, got $other")
  }

  /** Make the native expressions callable from spark.sql on a live session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    sqlFunctions.foreach { case (name, b) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, b)
    }
}

/** Session-extension entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and the native
  * functions are available in every new session's SQL dialect.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    native.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.PushPredicateThroughExplode)
  }
}
