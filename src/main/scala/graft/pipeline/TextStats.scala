package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data curation: token statistics,
  * quality scoring, lexicon-based language id, and rolling-hash document
  * fingerprints. All built-in Catalyst expressions over one token explode —
  * every aggregate shuffles on the document id (or the (lang, source)
  * rollup key), so the plans are a single exchange each at any scale.
  *
  * Division discipline: every ratio is integer-count / integer-count
  * computed once at the end (one double division is bit-deterministic;
  * summing doubles is not) — the same rule as the decimal discipline in
  * [[graft.queries.Relational]].
  */
object TextStats {

  /** One row per token occurrence: (idCol…, tok). Single-space split —
    * the corpus contract; swap the delimiter regex per corpus.
    */
  def tokens(df: DataFrame, textCol: String, keep: String*): DataFrame =
    df.select(keep.map(col) :+ explode(split(col(textCol), " ")).as("tok"): _*)

  /** Per-document token statistics: token count, distinct count, average
    * token length, type-token ratio.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String, keep: String*): DataFrame = {
    val tk = tokens(df, textCol, idCol +: keep: _*)
    tk.groupBy((idCol +: keep).map(col): _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"),
        (sum(length(col("tok"))).cast("double") / count(lit(1))).as("avg_tok_len"),
        (countDistinct(col("tok")).cast("double") / count(lit(1))).as("ttr"))
  }

  /** Stopword list for quality scoring — function words whose density
    * separates prose from keyword soup (the classic C4/Gopher-style
    * heuristic, public domain knowledge).
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in")

  /** Corpus quality profile per group (e.g. lang × source): document
    * count, token volume, stopword density, and how many documents pass a
    * simple quality gate (length in [minChars,maxChars] and stopword ratio
    * ≥ 1/20). Ratios aggregate as integer numerator/denominator sums.
    */
  def qualityProfile(
      df: DataFrame,
      idCol: String,
      textCol: String,
      charsCol: String,
      groupCols: Seq[String],
      minChars: Int = 200,
      maxChars: Int = 450): DataFrame = {
    val tk = tokens(df, textCol, (idCol +: charsCol +: groupCols).distinct: _*)
    val perDoc = tk
      .groupBy((idCol +: charsCol +: groupCols).distinct.map(col): _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isin(stopwords: _*), 1).otherwise(0)).as("n_stop"))
    perDoc.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_stop")).cast("double") / sum(col("n_tokens"))).as("stopword_ratio"),
        sum(when(
          col(charsCol) >= minChars && col(charsCol) <= maxChars &&
            col("n_stop") * 20 >= col("n_tokens"), 1).otherwise(0)).as("n_quality"))
  }

  /** Lexicon-based language identification: score = token hits per
    * language in `lexicon` (tok → lang), winner by (score desc, lang asc),
    * docs with zero hits → "und". The n-gram-profile approach at its
    * simplest — swap the lexicon for character n-grams per language for a
    * real corpus; the plan (explode → lexicon broadcast join → argmax
    * window) is the same.
    */
  def langId(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lexicon: DataFrame): DataFrame = {
    val tk = tokens(df, textCol, idCol)
    val scores = tk.join(broadcast(lexicon), Seq("tok"))
      .groupBy(col(idCol), col("lex_lang"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("lex_lang").asc)
    val best = scores.select(col(idCol), col("lex_lang"), col("score"),
      row_number().over(w).as("rn")).filter(col("rn") === 1)
    df.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("lex_lang"), lit("und")).as("detected_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Winnowing-style document fingerprints: k-token rolling shingles →
    * 64-bit hashes → the minimum hash in each sliding window of `window`
    * shingles (distinct). Two documents sharing any fingerprint share a
    * k-token run — the standard plagiarism/near-dup fingerprint
    * (Schleimer et al., SIGMOD'03). Output: (idCol, fingerprint).
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, window: Int = 4): DataFrame = {
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until k).map(i =>
      if (i == 0) col("tok") else lead(col("tok"), i).over(byPos))
    val withSep = parts.flatMap(p => Seq(p, lit(" "))).dropRight(1)
    val hashed = df
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .select(col(idCol), col("pos"), concat(withSep: _*).as("shingle"))
      .filter(col("shingle").isNotNull)
      .select(col(idCol), col("pos"), xxhash64(col("shingle")).as("h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, window - 1)
    hashed
      .select(col(idCol), min(col("h")).over(win).as("fingerprint"))
      .distinct()
  }
}
