package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval primitives over a document corpus: posting-table
  * inverted index, BM25 ranking, and deletion-neighborhood spelling-
  * variant mining (reference's search surface is an external indexer
  * hook, `search_index.py` — these implement the indexing math itself).
  *
  * Scale notes (100 TB corpus):
  *  - The posting table is the SHUFFLED-ONCE representation: one
  *    shuffle to aggregate (term, doc) term frequencies, then document
  *    frequency comes from a window over the term partition — no second
  *    corpus pass, no join. Stopword-scale terms make hot partitions;
  *    production would hash-bucket the term dimension (the df window is
  *    an associative count, so per-bucket partials compose).
  *  - BM25 scores only the postings of the query's terms: the term
  *    filter lands before the tf aggregation, so the corpus scan prunes
  *    to a semi-join on a literal IN-list and the shuffled volume is
  *    proportional to the query's postings, not the corpus.
  *  - Variant mining replaces the quadratic all-pairs edit-distance
  *    scan with the SymSpell deletion trick: every term emits its ≤L
  *    single-deletion variants; two terms at Levenshtein distance ≤ 1
  *    MUST share a variant (substitution → same-position deletions
  *    collide; insertion/deletion → one term IS the other's deletion;
  *    the shared-variant join is a candidate generator with perfect
  *    recall at distance 1), then an exact levenshtein() filter drops
  *    the false candidates (e.g. transpositions). Cost: O(vocab × len)
  *    candidates instead of O(vocab²) comparisons.
  */
object Search {

  private def tokens(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")

  /** Relational inverted index: one posting row per (term, doc) with
    * term frequency and document frequency. `minTermLen` drops short
    * function words; `minDf` drops hapax noise.
    */
  def invertedIndex(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", minTermLen: Int = 3,
                    minDf: Long = 5L): DataFrame = {
    val tf = tokens(docs, textCol, idCol)
      .filter(length(col("term")) >= minTermLen)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    // df over the term partition: the tf relation has exactly one row
    // per (term, doc), so a partition count IS document frequency —
    // no self-join, one shuffle on term
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .filter(col("df") >= minDf)
  }

  /** BM25 top-k: rank documents for a bag-of-terms query.
    *
    * Exactness discipline (the t9/t10 precedent): per-term
    * contributions are rounded to 6 decimals and summed as
    * DECIMAL(18,6), so the distributed combine order cannot change the
    * score; idf/length math is a fixed-shape expression tree that
    * DuckDB reproduces to the same double.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(docs, textCol, idCol)
    // doc length in tokens + corpus stats as a broadcast scalar; the
    // agg is lazy — no job until the caller executes
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = broadcast(dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl")))
    // postings restricted to the query's terms BEFORE aggregation: the
    // IN-list filter pushes into the token stream, so shuffle volume is
    // the query's postings, not the corpus
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val dfreq = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val scored = dfreq.join(dl, idCol).crossJoin(stats)
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs"))))
    val perTerm = round(idf * norm, 6).cast("decimal(18,6)")
    // top-k via orderBy+limit => TakeOrderedAndProject (distributed
    // per-partition top-k, k rows to the driver) — NOT a row_number
    // window, which would sort every scored doc in one partition. The
    // rank window then runs over k rows only.
    val topK = scored
      .groupBy(col(idCol))
      .agg(sum(perTerm).cast("double").as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    topK
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col(idCol)))
          .cast("int"))
      .select(col("rank"), col(idCol), col("score"), col("n_terms_hit"))
  }

  /** Edit-distance-1 term pairs via deletion-neighborhood blocking
    * (SymSpell): candidates share a single-deletion variant, then the
    * exact `levenshtein` filter keeps true distance-1 pairs. Returns
    * (w1, w2, n1, n2) with w1 < w2, one row per unordered pair.
    */
  def spellingVariantPairs(docs: DataFrame, textCol: String,
                           minTermLen: Int = 3, minFreq: Long = 1L): DataFrame = {
    val vocab = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term").rlike("^[a-z]+$") && length(col("term")) >= minTermLen)
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
    editDistanceOnePairs(vocab)
  }

  /** Single-deletion variant array for a string column (the term itself
    * first, then each deletion), built from codegen'd array/substr
    * expressions — no UDF.
    */
  def deletionVariants(term: Column): Column =
    array_union(
      array(term),
      transform(sequence(lit(1), length(term)), i =>
        concat(substr(term, lit(1), i - lit(1)),
          substr(term, i + lit(1), length(term)))))

  /** Edit-distance-1 pairs over a tokenized vocabulary column.
    * See [[spellingVariantPairs]] class doc for the algorithm.
    */
  def editDistanceOnePairs(vocab: DataFrame): DataFrame = {
    val withV = vocab.select(col("term"), col("n"),
      explode(deletionVariants(col("term"))).as("v"))
    val a = withV.select(col("v"), col("term").as("w1"), col("n").as("n1"))
    val bb = withV.select(col("v"), col("term").as("w2"), col("n").as("n2"))
    a.join(bb, "v")
      .filter(col("w1") < col("w2"))
      .select(col("w1"), col("w2"), col("n1"), col("n2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
  }

  /** Arbitrary-substring search via a character-trigram index:
    * candidate docs must contain EVERY trigram of the needle
    * (posting-intersection by count), then the exact `contains` check
    * confirms — LIKE '%needle%' without a full-corpus string scan.
    *
    * At 100 TB the trigram posting table (doc, gram) is the
    * precomputed index you persist bucketed by gram; query time then
    * touches |needle|-2 posting lists, not the corpus. Here the
    * posting build is inlined so the whole operator is one
    * self-contained plan; the verify join re-reads only candidate
    * docs. Occurrence counts are exact integer arithmetic.
    */
  def substringSearch(docs: DataFrame, needle: String,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(needle.length >= 3, "needle must be at least one trigram")
    val grams = needle.sliding(3).toSeq.distinct
    val t = col(textCol)
    val tri = docs.select(col(idCol),
      explode(array_distinct(
        transform(sequence(lit(1), greatest(length(t) - 2, lit(0))),
          i => t.substr(i, lit(3))))).as("g"))
      .filter(col("g").isin(grams: _*))
    val cand = tri.groupBy(col(idCol))
      .agg(count_distinct(col("g")).as("ng"))
      .filter(col("ng") === grams.length)
      .select(col(idCol))
    docs.join(cand, idCol)
      .filter(t.contains(needle))
      .select(col(idCol),
        ((length(t) - length(replace(t, lit(needle), lit("")))) /
          needle.length).cast("int").as("n_occurrences"))
  }
}
