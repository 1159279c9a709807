package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path (MinHash /
  * SimHash signatures). The HOF compositions evaluate interpreted with
  * per-element closure dispatch; these run one JVM loop per row using
  * Spark's own XXH64 (same algorithm as the `xxhash64` builtin, so
  * signatures stay comparable with the composable forms):
  * sig[j] = min over shingles s of xxh64(long=j, seed=xxh64(bytes(s), 42)) —
  * exactly XxHash64(Seq(s, j))'s fold.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(j.toLong, base)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName.stripSuffix("$")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $base = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = $xxh.hashLong((long) $j, $base);
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-token xxh64 votes +-1 per bit,
  * sign of each vote becomes the bit.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName.stripSuffix("$")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused k-shingle MinHash: token array -> signature in ONE loop,
  * without materializing the shingle-string array. Bit-identical to
  * `MinHashSig(wordShinglesFromTokens(toks, k), numHashes)`: each
  * window of k tokens is joined with a single space (concat_ws " ")
  * and hashed with the same seed chain; fewer than k tokens (incl.
  * empty) degrade to one shingle of all tokens joined — exactly the
  * HOF composition's `otherwise` branch.
  *
  * The measured win is NOT the hashing (already native) but skipping
  * the interpreted higher-order `transform(sequence…, slice+concat_ws)`
  * shingle build, which dominated the dedup wall-clock ~6:1.
  */
case class MinHashTokensSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_tokens_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_tokens_sig requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashTokensSig.compute(input.asInstanceOf[ArrayData], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashTokensSig.compute($arr, $k, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashTokensSig {
  private val SPACE = ' '.toByte

  /** One pass: window the token byte arrays, join with ' ', hash.
    * NULL tokens are skipped entirely (no separator), matching
    * `concat_ws`'s null handling in the composable HOF form, while the
    * window POSITIONS still count them (slice is positional).
    */
  def compute(arr: ArrayData, k: Int, numHashes: Int): GenericArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    // token bytes copied out once (getUTF8String returns views into the
    // row buffer; we need stable arrays to assemble windows from)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      toks(i) = if (s == null) null else s.getBytes
      i += 1
    }
    val last = if (n >= k) n - k else 0
    val width = if (n >= k) k else n
    var buf = new Array[Byte](64)
    i = 0
    while (i <= last) {
      var len = 0
      var appended = 0
      var j = 0
      while (j < width) {
        val t = toks(i + j)
        if (t != null) {
          val need = len + t.length + 1
          if (need > buf.length) {
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          }
          if (appended > 0) { buf(len) = SPACE; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          appended += 1
        }
        j += 1
      }
      val base = XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashLong(h.toLong, base)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** LSH band hashes of a MinHash signature: element b is the XXH64 fold
  * of the b-th `width`-wide slice of the signature, seeded with the
  * band index (so equal slices in different bands land in different
  * buckets). Only collision behavior matters for banding — any
  * deterministic injective-ish per-band hash yields the same candidate
  * semantics (true near-dups share an identical slice and collide
  * under every hash; cross-slice collisions are ~2^-64) — so this
  * replaces the interpreted `xxhash64(concat_ws(slice…))` string build
  * with 64 hashLong calls per row.
  */
case class MinHashBandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_hashes requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashBandHashes.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashBandHashes.compute($arr, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandHashes {
  def compute(sig: ArrayData, bands: Int): GenericArrayData = {
    val n = sig.numElements()
    val width = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = b * width
      val end = j + width
      while (j < end) { acc = XXH64.hashLong(sig.getLong(j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct character n-grams of a string, first-occurrence order —
  * equivalent to `array_distinct(charShingles(s, n))` (the interpreted
  * HOF build) but one code-point-aware loop. Strings shorter than n
  * yield the whole string as the single shingle, matching the HOF
  * `otherwise` branch.
  */
case class CharNgramSet(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngram_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_set requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharNgramSet.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramSet {
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    // Spark's substr counts CODE POINTS — iterate code points, not
    // UTF-16 units, so astral-plane text shingles identically
    val str = s.toString
    val cps = str.codePoints().toArray
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (cps.length < n) {
      out.add(s.clone())
    } else {
      var i = 0
      while (i <= cps.length - n) {
        out.add(UTF8String.fromString(new String(cps, i, n)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — corpus hygiene ahead of
  * dedup/hashing: byte-identical text is a precondition for exact
  * dedup, and composed-vs-decomposed accents defeat it. Spark has no
  * builtin; this wraps `java.text.Normalizer` as a codegen'd
  * expression (DuckDB's `nfc_normalize` is the oracle dual).
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeUnicode.forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unknown normalization form $form (NFC|NFD|NFKC|NFKD)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_unicode requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.compute(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.NormalizeUnicode.compute($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  private[functions] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def compute(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a scan without allocation
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s.clone()
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

object HashFunctions {
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(
      ColumnBridge.expression(shingles), numHashes))

  def minhash_tokens_sig(tokens: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(MinHashTokensSig(
      ColumnBridge.expression(tokens), k, numHashes))

  def minhash_band_hashes(sig: Column, bands: Int): Column =
    ColumnBridge.column(MinHashBandHashes(
      ColumnBridge.expression(sig), bands))

  def char_ngram_set(s: Column, n: Int): Column =
    ColumnBridge.column(CharNgramSet(ColumnBridge.expression(s), n))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  def normalize_unicode(s: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(s), form))
}
