package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Custom Catalyst expression for embedding dot products.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d,
  * _+_)` — is evaluated through interpreted lambda closures (higher-
  * order functions don't participate in whole-stage codegen), which
  * costs ~10 µs per 64-dim pair and dominates brute-force similarity
  * scans. This expression generates a primitive loop (`sum +=
  * a[i]*b[i]`) inside whole-stage codegen. Accumulation order is
  * left-to-right, so results are bit-identical to the HOF form.
  *
  * Null handling: null input → null; null *elements* contribute 0
  * (embeddings never carry null elements; branching per element would
  * cost more than it protects). Length mismatch: the product runs over
  * the SHORTER array's prefix — same convention as `zip_with`'s
  * truncating cousins in other engines; callers comparing embeddings
  * of differing dimensionality get a prefix dot product, not an error,
  * so validate dimensions upstream where mismatches are possible.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // DecimalType is a NumericType but has no primitive accessor — the
    // getByte fallthrough would misread it (codegen would silently
    // produce garbage); reject it at analysis instead of at runtime
    def ok(t: DataType): Boolean = t match {
      case ArrayType(_: DecimalType, _) => false
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two non-decimal numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val lt = elemType(left); val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += get(la, i, lt) * get(ra, i, rt)
      i += 1
    }
    sum
  }

  private def get(a: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  private def accessor(t: NumericType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case ShortType => "getShort"
    case _ => "getByte"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = accessor(elemType(left)); val ra = accessor(elemType(right))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ((double) $l.$la($i)) * ((double) $r.$ra($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared Euclidean distance of two numeric array columns:
  * Σ (a_i − b_i)², summed left to right.
  *
  * Spelled as the difference fold rather than |a|² − 2a·b + |b|²
  * deliberately: the expanded form cancels catastrophically when
  * a ≈ b (exactly the pairs a clustering assignment cares about), and
  * the fold's left-to-right order makes the value bit-identical to a
  * sequential replay (`list_sum(list_transform(...))` in DuckDB, the
  * interpreted HOF form in Spark) — which is what lets k-means
  * assignment rounds be exactly oracled. Same conventions as
  * [[DotProduct]]: null input → null, decimal arrays rejected at
  * analysis, length mismatch runs over the shorter prefix. */
case class SqL2Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(_: DecimalType, _) => false
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_l2_dist needs two non-decimal numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    val lt = elemType(left); val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val d = get(la, i, lt) - get(ra, i, rt)
      sum += d * d
      i += 1
    }
    sum
  }

  private def get(a: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  private def accessor(t: NumericType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case ShortType => "getShort"
    case _ => "getByte"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = accessor(elemType(left)); val ra = accessor(elemType(right))
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sum = ctx.freshName("sum"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $l.$la($i)) - ((double) $r.$ra($i));
         |  $sum += $d * $d;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2Dist =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd polynomial rolling hash over a string's codepoints:
  * acc = (acc * 31 + codepoint) % 1_000_000_007, left to right.
  *
  * The composable form — `aggregate(transform(split(text, ""), ascii),
  * 0L, (acc, c) => ...)` — runs every character through three
  * interpreted lambda hops (~30 µs/char stack overhead) and
  * materializes a per-codepoint string array; on a 100 TB corpus the
  * fingerprint pass would be interpreter-bound. This expression is the
  * same fold as a primitive loop inside whole-stage codegen.
  * Codepoint semantics match `split(s, "")` + `ascii` exactly: split
  * is codepoint-wise (surrogate pairs stay one element) and ascii
  * yields the full codepoint. Empty string → 0, null → null.
  * Callers wanting case-insensitivity compose with `lower()` (its
  * UTF8String lowercasing, untouched here).
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash needs a string input, got $t")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val cp = ctx.freshName("cp"); val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Per-row body shared by [[NfcNormalize]]'s interpreted and generated
  * paths (the SimHashUtil pattern: codegen emits ONE static call, the
  * loop runs as compiled bytecode inside the whole-stage). */
object NfcUtil {
  import org.apache.spark.unsafe.types.UTF8String

  /** Unicode NFC canonical composition. Fast path: most corpus text is
    * ASCII (or already composed) — `Normalizer.isNormalized` is a scan
    * without allocation, and returning the INPUT UTF8String untouched
    * skips the String round-trip entirely for such rows. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen expression — the
  * text-canonicalization step lexical dedup needs BEFORE hashing
  * (visually identical strings with decomposed vs precomposed
  * accents hash apart and defeat exact/MinHash dedup; NFC is the
  * canonical-composition form, so it never changes compatibility
  * characters the way NFKC would). Spark ships no normalize function;
  * the UDF alternative breaks whole-stage codegen. Engine-portable:
  * DuckDB's `nfc_normalize` / Postgres `normalize(s, NFC)` replay it
  * (same Unicode canonical-composition algorithm). */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs a string input, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcUtil.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Per-row loop bodies shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths of [[SimHash64]] / [[WordShingles]].
  * The generated code calls these static methods: the loops run as
  * plain compiled bytecode inside the whole-stage-codegen'd stage (one
  * monomorphic call per row), which keeps the expression out of the
  * interpreted-lambda trap without inlining a page of Java. */
object SimHashUtil {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  /** Engine-portable 64-bit base hash: the first 8 bytes of
    * MD5(UTF-8 bytes), big-endian, as a long bit pattern. Chosen over
    * xxhash64 so every signature in the MinHash/SimHash family can be
    * replayed bit-for-bit by any engine with an `md5()` —
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` in DuckDB — which is
    * what lets the d2/d3/d9/d10/cc3/e5 battery entries carry full
    * hash-match oracles instead of rows-only checks. MD5 costs ~5
    * cycles/byte vs xxhash's ~0.3, but the base hash runs ONCE per
    * shingle inside the scan stage and the k-wide signature mixes
    * reuse it, so the delta is invisible next to tokenization. */
  private val tlMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  def md5h64(s: UTF8String): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** Mersenne prime 2^61 - 1: the modulus of the Carter-Wegman
    * universal-hash family the MinHash permutations draw from. Chosen
    * because (a·h + b) mod p is exactly expressible in 128-bit
    * arithmetic on BOTH sides of the oracle (Math.multiplyHigh here,
    * HUGEINT in DuckDB), unlike mixes that wrap mod 2^64 — Spark 4's
    * ANSI mode and DuckDB both refuse silent 64-bit overflow. */
  val P61: Long = (1L << 61) - 1

  /** (a·h) mod 2^61-1 for 0 <= a, h < 2^61-1, via the 128-bit product
    * folded with 2^61 ≡ 1 (mod p). Branch-light; inlines into the
    * codegen'd signature loop. */
  def mulModP(a: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // product < 2^122 so hi < 2^58
    val lo = a * h
    var r = ((hi << 3) | (lo >>> 61)) + (lo & P61) // (v >> 61) + (v & p)
    r = (r & P61) + (r >>> 61)
    if (r >= P61) r - P61 else r
  }

  /** Affine constants (a_i in [1, p), b_i in [0, p)) for
    * [[minhashSig]], drawn identically to Dedup.minhashSignature and
    * the generated DuckDB oracles (same seed, same draw order: all k
    * multipliers first, then all k offsets). Cached per k; the map is
    * tiny (one entry per distinct signature width in the process). */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, { kk =>
      val rng = new scala.util.Random(0x5EEDL)
      val as = Array.fill(kk)(Math.floorMod(rng.nextLong(), P61 - 1) + 1)
      val bs = Array.fill(kk)(Math.floorMod(rng.nextLong(), P61))
      (as, bs)
    })

  /** 64-bit SimHash of a token array: bit b set iff the sum over
    * tokens of ±1 (sign of bit b of [[md5h64]](token)) is >= 0.
    * Bit-identical to the explode + 64-conditional-sums aggregation
    * formulation (Dedup.withSimhash): same per-token hash, same
    * tie-at-zero convention; a null token hashes as the empty string
    * (pipeline tokenizers never produce one). */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h = md5h64(
        if (arr.isNullAt(k)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(k))
      var b = 0
      while (b < 64) {
        cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      k += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) >= 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** k-permutation MinHash signature of a shingle array:
    * sig[i] = min over shingles of (a_i · h61(s) + b_i) mod 2^61-1,
    * where h61(s) = [[md5h64]](s) interpreted unsigned, mod 2^61-1.
    * All values live in [0, 2^61), so signed and unsigned min agree —
    * the DuckDB replay needs no two's-complement gymnastics. Empty
    * array → null (callers filter empty shingle sets first, matching
    * the aggregate formulation, whose explode emits no row for
    * them). */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val (as, bs) = perms(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h64 = md5h64(
        if (arr.isNullAt(j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(j))
      val h61 = java.lang.Long.remainderUnsigned(h64, P61)
      var i = 0
      while (i < k) {
        var v = mulModP(as(i), h61) + bs(i)
        if (v >= P61) v -= P61
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Space-join of the words whose index is not listed in `pos`
    * (out-of-range entries ignored); see [[RemoveTokens]]. */
  def removeTokens(words: ArrayData, pos: ArrayData, posIsLong: Boolean): UTF8String = {
    val n = words.numElements()
    val drop = new Array[Boolean](n)
    var i = 0
    while (i < pos.numElements()) {
      val p = if (pos.isNullAt(i)) -1L
              else if (posIsLong) pos.getLong(i) else pos.getInt(i).toLong
      if (p >= 0 && p < n) drop(p.toInt) = true
      i += 1
    }
    val kept = new java.util.ArrayList[UTF8String](n)
    var j = 0
    while (j < n) {
      if (!drop(j)) kept.add(if (words.isNullAt(j)) null else words.getUTF8String(j))
      j += 1
    }
    UTF8String.concatWs(SP, kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  private val SP = UTF8String.fromString(" ")

  /** Distinct space-joined word n-grams of a token array, first-
    * occurrence order. Same set as the explode/window + collect_set
    * and scan-stage gramRows formulations (order differs; every
    * consumer is set-semantic). Null tokens are skipped inside a gram
    * exactly as `concat_ws`/`array_join` skip them. */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out.add(UTF8String.concatWs(SP, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** Codegen'd span-removal rebuild: `RemoveTokens(words, positions)`
  * joins back the words whose 0-based index is NOT in `positions`
  * (space-separated), preserving order — the per-row half of
  * [[graft.pipeline.SpanDedup.removeDuplicateSpans]], which lets the
  * rebuild run where each document already is instead of exploding the
  * corpus token stream through a shuffle and collect_list-ing it back.
  * Positions outside [0, |words|) are ignored; null positions array is
  * treated as empty by the caller (coalesce); null words → null. */
case class RemoveTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(IntegerType | LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"remove_tokens needs (array<string>, array<int|long>), got ($l, $r)")
    }

  private def posIsLong = right.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(w: Any, p: Any): Any =
    SimHashUtil.removeTokens(w.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData], posIsLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p) =>
      s"${ev.value} = graft.functions.SimHashUtil.removeTokens($w, $p, $posIsLong);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokens =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd per-row SimHash64 over a words-array column (see
  * [[SimHashUtil.simhash]]). Replaces a posexplode + window + 64-sum
  * aggregation + join-back program: the signature is a per-document
  * function of the document alone, so computing it in the scan-stage
  * projection removes the token-row shuffle entirely AND shrinks the
  * compiled plan (the 64 aggregate columns dominated d3's ~20 s cold
  * codegen time). Null array → null; null elements hash as the
  * empty string. */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashUtil.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Codegen'd distinct word-n-gram shingles of a words-array column
  * (see [[SimHashUtil.wordShingles]]). Null array → null (callers
  * coalesce to empty where the legacy left-join shape did). */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.wordShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashUtil.wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Codegen'd per-row k-permutation MinHash signature of a shingle-array
  * column (see [[SimHashUtil.minhashSig]]). Replaces an explode + k
  * min-aggregates + join-back program with a scan-stage projection —
  * same motivation and same value-identity discipline as [[SimHash64]]
  * (the permutation constants replicate Dedup.permConsts draw-for-
  * draw). Null/empty array → null. */
case class MinHashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, s"signature width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $v =
         |  graft.functions.SimHashUtil.minhashSig($c, $k);
         |if ($v == null) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Codegen'd engine-portable 64-bit string hash: the first 8 bytes of
  * MD5(UTF-8 bytes), big-endian, as a long bit pattern (see
  * [[SimHashUtil.md5h64]]). Used for LSH bucket keys where the key
  * must be replayable by another engine —
  * `('0x' || substr(md5(s), 1, 16))::UBIGINT` in DuckDB has the same
  * 64 bits — while staying an 8-byte shuffle key rather than a hex
  * string. Null → null. */
case class Md5Long(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_long needs a string input, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.md5h64(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashUtil.md5h64($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

/** Bloom-sketch membership probe over a LongType hash column, with the
  * serialized sketch held as a CONSTRUCTOR FIELD rather than a child
  * `Literal`. Semantically identical to Spark's
  * `BloomFilterMightContain(Literal(bytes), child)` — same
  * `org.apache.spark.util.sketch.BloomFilter` deserialization, same
  * `mightContainLong`, same null-in/null-out — but a ~1 MB binary
  * Literal is a plan-cost trap: `Literal.toString` hex-prints the
  * whole array into EVERY plan-stringification event (the SQL-listener
  * execution-start event plus one AQE update per materialized stage,
  * all computed synchronously on the action thread), and
  * `Literal.hashCode` re-hashes the full megabyte on every expression-
  * set/canonicalization lookup inside the optimizer. Holding the bytes
  * outside the expression tree makes plan events O(plan), not
  * O(sketch); case-class equality on `Array[Byte]` is reference
  * equality, so no hashing of the payload either. Codegen references
  * the DESERIALIZED filter once per plan (`addReferenceObj`) and calls
  * `mightContainLong` per row inside whole-stage codegen. */
case class BloomSketchContains(child: Expression, sketch: Array[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(sketch))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_sketch_contains needs a long (hash) input, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomSketch", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override def toString: String =
    s"bloom_sketch_contains($child, <${sketch.length}B sketch>)"
  override def simpleString(maxFields: Int): String = toString

  override protected def withNewChildInternal(newChild: Expression): BloomSketchContains =
    copy(child = newChild)
}

/** Per-row loop bodies for int8 scalar quantization ([[SqCodes]] /
  * [[SqError]]) — called from both the interpreted and generated
  * paths, like [[SimHashUtil]]. Arithmetic replicates the HOF
  * formulation op-for-op (floor((x−mn)/(mx−mn)·255 + ½); recon =
  * mn + c/255·(mx−mn); sequential left-fold error sum), so results
  * stay bit-identical to the DuckDB oracle replay. */
object SqUtil {
  /** Null elements fail loudly rather than silently reading as 0.0
    * (ArrayData's primitive accessors return zeros for null slots):
    * a null component is dimension corruption, the same class of
    * drift as a wrong-length vector. */
  private def checkNotNull(arr: ArrayData, i: Int): Unit =
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(
        s"scalar quantization: null element at dimension $i")

  def codes(arr: ArrayData, isFloat: Boolean,
      mins: Array[Double], maxs: Array[Double]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      checkNotNull(arr, i)
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val mn = mins(i); val mx = maxs(i)
      out(i) =
        if (mx == mn) 0L
        else math.floor((x - mn) / (mx - mn) * 255 + 0.5).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def sqError(arr: ArrayData, isFloat: Boolean,
      mins: Array[Double], maxs: Array[Double]): Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      checkNotNull(arr, i)
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val mn = mins(i); val mx = maxs(i)
      val recon =
        if (mx == mn) mn
        else mn + math.floor((x - mn) / (mx - mn) * 255 + 0.5) / 255.0 * (mx - mn)
      val d = x - recon
      s += d * d
      i += 1
    }
    s
  }
}

/** Codegen'd int8 scalar-quantization codes of a float/double array
  * against per-dimension (mn, mx) bounds — the scan-stage encode of
  * [[graft.pipeline.ScalarQuant]]. The HOF formulation (transform +
  * element_at over literal bound arrays) runs interpreted at
  * ~30 µs/element; this is the same arithmetic as a primitive loop in
  * whole-stage codegen. A vector longer than the bounds arrays throws
  * (dimension drift must fail loudly, not truncate). Null → null. */
case class SqCodes(child: Expression,
    mins: Array[Double], maxs: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_codes needs array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    SqUtil.codes(input.asInstanceOf[ArrayData], isFloat, mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SqUtil.codes($c, $isFloat, $mnRef, $mxRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqCodes =
    copy(child = newChild)
}

/** Codegen'd squared reconstruction error of [[SqCodes]]' quantization
  * — a sequential left fold, so the value is order-deterministic and
  * bit-identical to the interpreted HOF formulation. Null → null. */
case class SqError(child: Expression,
    mins: Array[Double], maxs: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_error needs array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    SqUtil.sqError(input.asInstanceOf[ArrayData], isFloat, mins, maxs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SqUtil.sqError($c, $isFloat, $mnRef, $mxRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SqError =
    copy(child = newChild)
}

object VectorExprs {
  /** Codegen'd dot product of two numeric array columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Codegen'd squared Euclidean distance of two numeric array
    * columns (difference fold — see [[SqL2Dist]]). */
  def sqL2Dist(a: Column, b: Column): Column =
    Bridge.toColumn(SqL2Dist(Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Codegen'd Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfcNormalize(s: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(s)))

  /** Codegen'd codepoint rolling hash (see [[RollingHash]]). */
  def rollingHash(s: Column): Column =
    Bridge.toColumn(RollingHash(Bridge.toExpression(s)))

  /** Codegen'd per-row SimHash64 of a words-array column. */
  def simhash64Words(words: Column): Column =
    Bridge.toColumn(SimHash64(Bridge.toExpression(words)))

  /** Codegen'd distinct word n-gram shingles of a words-array column. */
  def wordShingles(words: Column, n: Int): Column =
    Bridge.toColumn(WordShingles(Bridge.toExpression(words), n))

  /** Codegen'd per-row k-permutation MinHash signature. */
  def minhashSig(shingles: Column, k: Int): Column =
    Bridge.toColumn(MinHashSig(Bridge.toExpression(shingles), k))

  /** Codegen'd order-preserving token removal by position. */
  def removeTokens(words: Column, positions: Column): Column =
    Bridge.toColumn(RemoveTokens(Bridge.toExpression(words), Bridge.toExpression(positions)))

  /** Codegen'd engine-portable md5-based 64-bit string hash. */
  def md5Long(s: Column): Column =
    Bridge.toColumn(Md5Long(Bridge.toExpression(s)))

  /** Codegen'd int8 scalar-quantization codes against per-dim bounds. */
  def sqCodes(vec: Column, mins: Array[Double], maxs: Array[Double]): Column =
    Bridge.toColumn(SqCodes(Bridge.toExpression(vec), mins, maxs))

  /** Codegen'd squared reconstruction error of the SQ codes. */
  def sqError(vec: Column, mins: Array[Double], maxs: Array[Double]): Column =
    Bridge.toColumn(SqError(Bridge.toExpression(vec), mins, maxs))
}
