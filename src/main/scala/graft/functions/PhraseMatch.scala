package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring matching for blocklist curation (the
  * C4/Gopher "banned word list" corpus filter — reference parity has
  * no equivalent; this is LLM-pipeline surface): given a fixed phrase
  * list compiled ONCE into an Aho–Corasick automaton, one pass over
  * the text reports every distinct phrase that occurs as a substring.
  *
  * Why an automaton and not `exists(phrases, p -> contains(text, p))`:
  * the naive form re-scans the text once per phrase — O(P·len) per
  * row, and real blocklists carry hundreds to thousands of phrases.
  * The AC scan is O(len + matches) regardless of P: each input char
  * advances one goto/fail walk, and match emission follows precomputed
  * merged output lists. At 100 TB (one pass over every document) the
  * P× factor is the difference between one corpus scan and hundreds.
  *
  * The automaton is built on the driver from the expression's phrase
  * literals, shipped to executors inside the expression (plain
  * Serializable — a few KB for realistic blocklists), and referenced
  * from generated code via `addReferenceObj`, so the scan stays inside
  * whole-stage codegen as a single JVM call per row.
  *
  * Matching is EXACT substring (UTF-16 code units, case-sensitive):
  * callers lowercase/normalize text and phrases to taste. The result
  * lists matched phrases in phrase-list order — deterministic, so a
  * DuckDB oracle can replay it with per-phrase `position()` checks.
  */
final class AhoCorasick(val phrases: Array[String]) extends Serializable {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")
  require(phrases.distinct.length == phrases.length,
    "phrases must be distinct")

  // Trie over UTF-16 code units. Node 0 is the root. Transitions live
  // in per-node hash maps (blocklist alphabets are tiny; dense
  // char-indexed arrays would waste 256 KB per node).
  private val gotoMaps =
    new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
  private def newNode(): Int = {
    gotoMaps.add(new java.util.HashMap[Character, Integer]())
    gotoMaps.size() - 1
  }
  newNode() // root

  // endsAt(node) = phrase id ending exactly at node, or -1.
  private val endsAt = new java.util.ArrayList[Integer]()
  endsAt.add(-1)

  locally {
    var pid = 0
    while (pid < phrases.length) {
      val p = phrases(pid)
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val next = gotoMaps.get(node).get(c)
        node = if (next != null) next.intValue()
        else {
          val n = newNode()
          endsAt.add(-1)
          gotoMaps.get(node).put(c, n)
          n
        }
        i += 1
      }
      endsAt.set(node, pid)
      pid += 1
    }
  }

  private val nNodes = gotoMaps.size()
  private val fail = new Array[Int](nNodes)
  // Merged output list per node: phrase ids ending at the node itself
  // or at any node on its fail chain (so emission at scan time is a
  // single array walk, no chain re-traversal).
  private val outputs = new Array[Array[Int]](nNodes)

  locally {
    outputs(0) =
      if (endsAt.get(0) >= 0) Array(endsAt.get(0).intValue()) else Array.empty
    val queue = new java.util.ArrayDeque[Integer]()
    val rootIt = gotoMaps.get(0).entrySet().iterator()
    while (rootIt.hasNext) {
      val e = rootIt.next()
      fail(e.getValue) = 0
      queue.add(e.getValue)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val own = endsAt.get(u).intValue()
      val inherited = outputs(fail(u))
      outputs(u) =
        if (own < 0) inherited
        else {
          val merged = new Array[Int](inherited.length + 1)
          merged(0) = own
          System.arraycopy(inherited, 0, merged, 1, inherited.length)
          merged
        }
      val it = gotoMaps.get(u).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val v = e.getValue.intValue()
        // fail(v) = deepest proper suffix of path(v) present in the trie
        var f = fail(u)
        var hop = gotoMaps.get(f).get(c)
        while (hop == null && f != 0) {
          f = fail(f)
          hop = gotoMaps.get(f).get(c)
        }
        fail(v) = if (hop != null && hop.intValue() != v) hop.intValue() else 0
        queue.add(v)
      }
    }
  }

  private val utf8Phrases: Array[UTF8String] =
    phrases.map(UTF8String.fromString)

  /** Distinct phrases occurring in `text` as substrings, in
    * phrase-list order, as Spark array data. Called from both
    * interpreted eval and generated code.
    *
    * The scan walks the UTF8String's bytes directly, decoding UTF-8
    * code points to the UTF-16 code units the trie is keyed by —
    * `text.toString` would allocate a full String copy (plus a
    * UTF-8→UTF-16 transcode buffer) per row on exactly the hot path
    * this expression exists to keep single-pass. Astral code points
    * step the automaton as a surrogate pair, matching how the phrase
    * strings were trie-inserted char by char.
    */
  def matchedPhrases(text: UTF8String): GenericArrayData = {
    val nb = text.numBytes()
    val seen = new Array[Boolean](phrases.length)
    var nSeen = 0
    var node = 0
    def step(c: Char): Unit = {
      var hop = gotoMaps.get(node).get(c)
      while (hop == null && node != 0) {
        node = fail(node)
        hop = gotoMaps.get(node).get(c)
      }
      node = if (hop != null) hop.intValue() else 0
      val out = outputs(node)
      var k = 0
      while (k < out.length) {
        if (!seen(out(k))) { seen(out(k)) = true; nSeen += 1 }
        k += 1
      }
    }
    // malformed input contract: an invalid lead byte (bare
    // continuation 0x80-0xBF, 0xF8-0xFF) or a sequence with invalid
    // continuation bytes steps ONE byte and resets the automaton to
    // root — the bad byte cannot extend any phrase, adjacent valid
    // text still matches, and the scan degrades predictably instead of
    // silently swallowing up to 3 good bytes
    def cont(k: Int): Boolean = (text.getByte(k) & 0xc0) == 0x80
    var i = 0
    while (i < nb && nSeen < phrases.length) {
      val b0 = text.getByte(i) & 0xff
      if (b0 < 0x80) { step(b0.toChar); i += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        if (i + 2 > nb) i = nb // truncated tail: stop, never over-read
        else if (!cont(i + 1)) { node = 0; i += 1 }
        else {
          val cp = ((b0 & 0x1f) << 6) | (text.getByte(i + 1) & 0x3f)
          // overlong (cp < 0x80) is malformed, not an ASCII char
          if (cp < 0x80) { node = 0; i += 1 }
          else { step(cp.toChar); i += 2 }
        }
      } else if ((b0 & 0xf0) == 0xe0) {
        if (i + 3 > nb) i = nb
        else if (!cont(i + 1) || !cont(i + 2)) { node = 0; i += 1 }
        else {
          val cp = ((b0 & 0x0f) << 12) | ((text.getByte(i + 1) & 0x3f) << 6) |
            (text.getByte(i + 2) & 0x3f)
          // overlong and bare-surrogate encodings are malformed —
          // emitting them would let garbage bytes impersonate real
          // BMP characters inside a phrase match
          if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) {
            node = 0; i += 1
          } else { step(cp.toChar); i += 3 }
        }
      } else if ((b0 & 0xf8) == 0xf0) {
        if (i + 4 > nb) i = nb
        else if (!cont(i + 1) || !cont(i + 2) || !cont(i + 3)) {
          node = 0; i += 1
        } else {
          val cp = ((b0 & 0x07) << 18) |
            ((text.getByte(i + 1) & 0x3f) << 12) |
            ((text.getByte(i + 2) & 0x3f) << 6) |
            (text.getByte(i + 3) & 0x3f)
          // overlong (cp < 0x10000 — a NEGATIVE surrogate offset would
          // emit valid Hangul jamo chars from garbage bytes) and
          // beyond-Unicode values are malformed
          if (cp < 0x10000 || cp > 0x10ffff) { node = 0; i += 1 }
          else {
            val off = cp - 0x10000
            step((0xd800 + (off >> 10)).toChar)
            step((0xdc00 + (off & 0x3ff)).toChar)
            i += 4
          }
        }
      } else { node = 0; i += 1 } // invalid lead byte
    }
    val hits = new Array[Any](nSeen)
    var w = 0
    var pid = 0
    while (pid < phrases.length) {
      if (seen(pid)) { hits(w) = utf8Phrases(pid); w += 1 }
      pid += 1
    }
    new GenericArrayData(hits)
  }

  /** Plain-JVM twin of [[matchedPhrases]] for spec-side naive
    * comparison, returning matched phrase strings.
    */
  def matchedPhraseStrings(text: String): Seq[String] = {
    val arr = matchedPhrases(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }
}

/** `phrase_matches(text)` against a compile-time phrase list: array of
  * the distinct listed phrases occurring in `text`, in list order.
  */
case class PhraseMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "phrase_matches"

  // phrase-list validity is re-checked here (not only in the lazy
  // AhoCorasick constructor) so an invalid blocklist fails at ANALYSIS
  // time with a planner error instead of surfacing as a runtime task
  // failure when the automaton is first forced on an executor
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (phrases.isEmpty)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-empty phrase list")
      else if (phrases.exists(_.isEmpty))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName phrases must be non-empty strings")
      else if (phrases.distinct.length != phrases.length)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName phrases must be distinct")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.sql}")
  }

  @transient private lazy val ac = new AhoCorasick(phrases.toArray)

  override def nullSafeEval(text: Any): Any =
    ac.matchedPhrases(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("phraseAc", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, text =>
      s"${ev.value} = $acRef.matchedPhrases($text);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level facade. */
object PhraseMatch {
  def phrase_matches(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(PhraseMatches(ColumnBridge.expression(text), phrases))
}
